"""Skew mitigation utilities (SURVEY §7 M5 scale posture).

AQE's skew-join splitting handles join-side skew automatically
(session.py enables it), but a skewed AGGREGATION key still funnels one
key's rows through one task. ``salted_agg`` is the standard two-phase
rewrite: salt the key, partial-aggregate per (key, salt), then merge
the partials — turning one hot reducer into ``salt`` parallel ones.

Only aggregates with a merge decomposition qualify (sum/count/min/max,
and avg as sum+count). The API takes the decomposed form explicitly so
the caller states the merge, keeping the operator honest.

The reference's analog is its per-``Structure`` fan-out
(reference: src/etl.py:186-195): one serial fetch per key value — the
exact shape that, parallelized naively, makes one hot structure the
straggler. Salting is the distributed answer.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: dict[str, Column],
    merge_aggs: dict[str, Column],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs``: name -> aggregate over the raw rows (phase 1,
    grouped by keys + salt). ``merge_aggs``: name -> aggregate over the
    phase-1 partials (phase 2, grouped by keys only), referencing the
    phase-1 output columns by name.

    Example — skew-proof sum/count/avg:

        salted_agg(
            df, ["k"],
            partial_aggs={"s": F.sum("v"), "c": F.count(F.lit(1))},
            merge_aggs={"s": F.sum("s"), "c": F.sum("c")},
        ).withColumn("avg", F.col("s") / F.col("c"))

    The salt column is random-per-row but the RESULT is deterministic:
    any row-to-salt assignment yields the same merged aggregate (that
    is the decomposition contract).
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[c.alias(n) for n, c in partial_aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[c.alias(n) for n, c in merge_aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the big side's key randomly, replicate
    the small side ``salt`` times, join on (key, salt).

    A hot key's rows land in ``salt`` different shuffle partitions
    instead of one straggler task; the small side pays a ×salt
    replication (fine when it's dimension-sized). The row-to-salt
    assignment is random but the JOIN RESULT is deterministic — every
    big row still meets exactly its matching small rows. Use when AQE's
    skew splitting can't help (e.g. the skew is in a grouped shuffle
    that AQE won't split, or on engines/paths without AQE); otherwise
    prefer AQE (on by default in session.py).

    Only big-side-preserving join types are allowed: replicating the
    small side ``salt`` times would emit each unmatched small row
    ``salt`` times under right/full-outer semantics.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — small-side replication "
            f"breaks right/full-outer semantics; use one of {sorted(allowed)}"
        )
    big_s = big.withColumn("__salt_l", (F.rand(seed=7) * salt).cast("int"))
    small_s = small.withColumn(
        "__salt_r", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    joined = big_s.join(
        small_s,
        (big_s[big_key] == small_s[small_key])
        & (big_s["__salt_l"] == small_s["__salt_r"]),
        how,
    )
    return joined.drop("__salt_l", "__salt_r")
