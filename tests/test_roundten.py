"""Round-10 STAGED queries (plans/roundten.py) — oracle parity +
mechanism deep-dives, run every session while the queries await a cap
ruling (registry frozen at 201 by the r09 verdict)."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.roundten import (
    APPEND_COMPACT_ORACLE,
    DSIR_ORACLE,
    STAGED,
    s_snapshot_append_compact,
    t_dsir_importance,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_staged_specs_have_eager_oracles():
    assert set(STAGED) == {
        "s_snapshot_append_compact",
        "t_dsir_importance",
        "d_semdedup_incremental",
    }
    for spec in STAGED.values():
        assert spec.oracle and spec.oracle.strip()


def test_append_compact_lifecycle_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        s_snapshot_append_compact(spark, sf_dir),
        _con(sf_dir),
        APPEND_COMPACT_ORACLE,
        "s_snapshot_append_compact",
    )


def test_dsir_importance_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        t_dsir_importance(spark, sf_dir),
        _con(sf_dir),
        DSIR_ORACLE,
        "t_dsir_importance",
    )


def test_dsir_scores_separate_target_lookalikes(spark, sf_dir):
    """Directional sanity on the MATH (not just parity): a raw doc
    whose tokens all occur in the target slice must outscore a raw doc
    whose tokens never do. Build the check from the fixture itself:
    compare the top-ranked selection's mean score against the overall
    raw mean — selection must be strictly above unless every raw doc
    ties (degenerate fixture)."""
    got = t_dsir_importance(spark, sf_dir).collect()
    if len(got) < 10:
        return  # tiny fixture — parity test already covers it
    top10 = sum(r["dsir_score"] for r in got[:10]) / 10
    all50 = sum(r["dsir_score"] for r in got) / len(got)
    assert top10 >= all50
    assert [r["sel_rank"] for r in got] == list(range(1, len(got) + 1))


def test_semdedup_incremental_matches_oracle(spark, sf_dir):
    from turnover_odata_etl_spark.plans.roundten import (
        SEMDEDUP_INCREMENTAL_ORACLE,
        d_semdedup_incremental,
    )

    compare_spark_vs_oracle(
        d_semdedup_incremental(spark, sf_dir),
        _con(sf_dir),
        SEMDEDUP_INCREMENTAL_ORACLE,
        "d_semdedup_incremental",
    )


def test_semdedup_wave_consults_persistent_index(spark, tmp_path):
    """The INCREMENTAL mechanism itself (the contract oracle can't
    see it): a wave-2 arrival near-duplicating a wave-1 KEPT
    representative is dropped by the index lookup, and the reps table
    ends holding exactly the kept set."""
    import numpy as np

    from turnover_odata_etl_spark.plans.roundten import semdedup_wave
    from turnover_odata_etl_spark.storage import SnapshotTable

    cents = np.array([[1.0, 0.0, 0.0, 0.0]])  # one cell — no split
    reps = SnapshotTable(
        spark, str(tmp_path / "reps"),
        key_cols=["cell", "nid"], order_col="__ver", n_buckets=2,
        bucket_cols=["cell"],
    )

    def vdf(rows):
        return spark.createDataFrame(
            [(nid, [float(x) for x in v]) for nid, v in rows],
            "nid long, vec array<float>",
        )

    w1 = vdf([(1, [1, 0, 0, 0]), (2, [0, 1, 0, 0])])  # dissimilar
    f1 = semdedup_wave(reps, w1, cents, 0.45, 1)
    assert {(r["nid"], r["keep"]) for r in f1.collect()} == {
        (1, True), (2, True),
    }
    # wave 2: nid 3 duplicates KEPT rep 1 (cross-wave — only the
    # persisted index can know); nid 4 is novel
    w2 = vdf([(3, [0.999, 0.01, 0, 0]), (4, [0, 0, 1, 0])])
    f2 = semdedup_wave(reps, w2, cents, 0.45, 2)
    assert {(r["nid"], r["keep"]) for r in f2.collect()} == {
        (3, False), (4, True),
    }
    kept_in_index = sorted(
        r["nid"] for r in reps.read().select("nid").collect()
    )
    assert kept_in_index == [1, 2, 4]
    assert reps.current_id() == 2  # one append commit per wave
