"""Round-15 STAGED queries (plans/roundfifteen.py) — oracle parity,
run every session while the queries await a cap ruling (registry
frozen at 218 by the r14 verdict). Mechanism deep-dives live in
tests/test_quality.py."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.roundfifteen import STAGED

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
    for spec in STAGED.values():
        assert spec.oracle and spec.oracle.strip()


def test_quality_classifier_matches_oracle(spark, sf_dir):
    spec = STAGED["t_quality_classifier"]
    compare_spark_vs_oracle(
        spec.fn(spark, sf_dir),
        _con(sf_dir),
        spec.oracle,
        "t_quality_classifier",
    )


def test_tag_gc_query_matches_oracle(spark, sf_dir):
    spec = STAGED["s_snapshot_tag_gc"]
    compare_spark_vs_oracle(
        spec.fn(spark, sf_dir),
        _con(sf_dir),
        spec.oracle,
        "s_snapshot_tag_gc",
    )


def test_group_wap_rebuild_matches_oracle(spark, sf_dir):
    spec = STAGED["s_group_wap_rebuild"]
    compare_spark_vs_oracle(
        spec.fn(spark, sf_dir),
        _con(sf_dir),
        spec.oracle,
        "s_group_wap_rebuild",
    )
