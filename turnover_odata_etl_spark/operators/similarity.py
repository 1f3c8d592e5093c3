"""Similarity search over embedding columns (SURVEY §2.12 E9).

Two tiers:

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, cosine via ``zip_with``/``aggregate``
  (JVM-side, no UDF), per-query top-k via window. Cost O(|Q|·|corpus|)
  but embarrassingly parallel and map-only until the tiny top-k
  shuffle — the right baseline, and still the right answer when |Q|
  is small even at a 100 TB corpus.

- ``srp_lsh_topk`` — sign-random-projection LSH: deterministic
  md5-derived hyperplanes bucket vectors by sign-bit signature;
  queries only compare against same-bucket vectors (multi-table OR
  for recall), then exact re-rank. Sub-linear per query; recall < 1
  by construction (tests assert a floor against brute force).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.
    Output: (query_id, neighbor_id, cos, rn)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: each component
    derived from md5(table, plane, i) → [-0.5, 0.5). No RNG state."""
    comps = []
    for i in range(dim):
        h = hashlib.md5(f"srp:{table}:{plane}:{i}".encode()).digest()
        comps.append(int.from_bytes(h[:4], "big") / 2**32 - 0.5)
    return comps


def srp_signature(vec_col, table: int, planes: int, dim: int):
    """Sign-bit signature of ``vec_col`` against ``planes`` fixed
    hyperplanes → integer bucket id. Pure column expression."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        hp = F.array(*[F.lit(c) for c in _hyperplane(table, p, dim)])
        dot = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), hp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a bucket
    with the query in ANY of ``tables`` independent signature tables,
    exact cosine re-rank on candidates only.

    At scale: corpus signatures are map-only; each table's lookup is a
    shuffle keyed on (table, bucket) — 2^planes buckets per table keeps
    partitions balanced. Increasing ``tables`` raises recall at linear
    cost; ``planes`` trades bucket size vs. collision rate."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    q_sigs = q.select(
        "query_id",
        "q_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        srp_signature(F.col("q_vec"), t, planes, dim).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("sb"),
    ).select("query_id", "q_vec", "sb.tbl", "sb.bucket")
    c_sigs = c.select(
        "neighbor_id",
        "c_vec",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("tbl"),
                        srp_signature(F.col("c_vec"), t, planes, dim).alias("bucket"),
                    )
                    for t in range(tables)
                ]
            )
        ).alias("sb"),
    ).select("neighbor_id", "c_vec", "sb.tbl", "sb.bucket")

    cands = (
        q_sigs.join(c_sigs, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
    )
    scored = cands.withColumn("cos", cosine("q_vec", "c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )
