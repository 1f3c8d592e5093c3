"""Round-13 STAGED queries (plans/roundthirteen.py) — oracle parity,
run every session while the queries await a cap ruling (registry
frozen at 211 by the r12 verdict). Mechanism deep-dives live in
tests/test_agg_stats.py and tests/test_snapshot_bloom.py."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.roundthirteen import (
    AGG_STATS_ORACLE,
    BLOOM_DELETE_ORACLE,
    COBUCKET_ORACLE,
    HISTORY_ORACLE,
    STAGED,
    s_join_cobucketed,
    s_snapshot_agg_stats,
    s_snapshot_bloom_pruned_delete,
    s_snapshot_history,
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
        "s_snapshot_agg_stats", "s_snapshot_bloom_pruned_delete",
        "s_join_cobucketed", "s_snapshot_history",
    }
    for spec in STAGED.values():
        assert spec.oracle and spec.oracle.strip()


def test_agg_stats_query_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        s_snapshot_agg_stats(spark, sf_dir),
        _con(sf_dir),
        AGG_STATS_ORACLE,
        "s_snapshot_agg_stats",
    )


def test_agg_stats_query_meta_row_reports_zero_reads(spark, sf_dir):
    """The meta row's files_read column is the in-band zero-data-
    files pin: the manifest path must answer without opening any
    file at this fixture scale (all bounds exact: numerics + short
    event_type strings)."""
    rows = {
        r["path"]: r
        for r in s_snapshot_agg_stats(spark, sf_dir).collect()
    }
    assert rows["meta"]["files_read"] == 0
    assert rows["meta"]["n_rows"] == rows["scan"]["n_rows"]


def test_bloom_delete_query_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        s_snapshot_bloom_pruned_delete(spark, sf_dir),
        _con(sf_dir),
        BLOOM_DELETE_ORACLE,
        "s_snapshot_bloom_pruned_delete",
    )


def test_cobucket_query_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        s_join_cobucketed(spark, sf_dir),
        _con(sf_dir),
        COBUCKET_ORACLE,
        "s_join_cobucketed",
    )


def test_history_query_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        s_snapshot_history(spark, sf_dir),
        _con(sf_dir),
        HISTORY_ORACLE,
        "s_snapshot_history",
    )
