"""Round-9 staging queries (plans/roundnine.py) — oracle-tested every
session even though they are not registered (the registry is frozen at
191 per the r07 cap ruling; see the module docstring's activation
checklist)."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.registry import all_specs
from turnover_odata_etl_spark.plans.roundnine import (
    AVI_ORACLE,
    EXACT_SUBSTR_CLEAN_ORACLE,
    d_exact_substr_clean,
    m_avi_decode_features,
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


def test_avi_decode_features_matches_oracle(spark, sf_dir):
    assert AVI_ORACLE  # eager constant, never None
    compare_spark_vs_oracle(
        m_avi_decode_features(spark, sf_dir),
        _con(sf_dir),
        AVI_ORACLE,
        "m_avi_decode_features",
    )


def test_exact_substr_clean_matches_oracle(spark, sf_dir):
    assert EXACT_SUBSTR_CLEAN_ORACLE
    compare_spark_vs_oracle(
        d_exact_substr_clean(spark, sf_dir),
        _con(sf_dir),
        EXACT_SUBSTR_CLEAN_ORACLE,
        "d_exact_substr_clean",
    )


def test_exact_substr_clean_is_a_fixpoint(spark, sf_dir):
    """Re-analyzing the cleaned corpus must find nothing — the
    idempotence ExactSubstr removal promises (duplicate spans either
    survived as canonicals or were cut entirely)."""
    from pyspark.sql import functions as F

    from turnover_odata_etl_spark.operators.dedup import (
        duplicate_spans,
        remove_duplicate_spans,
    )
    from turnover_odata_etl_spark.plans.llm import _with_tk
    from turnover_odata_etl_spark.tables import load_table

    docs = _with_tk(load_table(spark, sf_dir, "documents"))
    cleaned = remove_duplicate_spans(docs, "tk", "doc_id", k=8).select(
        "doc_id", F.col("tokens_clean").alias("tk")
    )
    assert duplicate_spans(cleaned, "tk", "doc_id", k=8).count() == 0


def test_roundnine_is_not_registered_yet():
    """The staging module must not leak into the driver contract while
    the registry freeze holds (191 after the round-8 activations)."""
    specs = all_specs()
    assert "m_avi_decode_features" not in specs
    assert "d_exact_substr_clean" not in specs
