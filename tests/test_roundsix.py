"""Round-5-staged queries (plans/roundsix.py), ACTIVATED in round 6:
registered in the driver contract and additionally oracle-checked
here directly (a second net alongside tests/test_oracle_parity)."""

from __future__ import annotations

import duckdb
import pytest

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.registry import all_specs
from turnover_odata_etl_spark.plans.roundsix import (
    JPEG_ORACLE,
    m_jpeg_decode_features,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def test_jpeg_decode_features_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    compare_spark_vs_oracle(
        m_jpeg_decode_features(spark, sf_dir),
        con,
        JPEG_ORACLE,
        "m_jpeg_decode_features",
    )


def test_roundsix_is_registered():
    """Round 6 lifted the freeze: the staged JPEG query must be in the
    driver contract, with its oracle attached."""
    specs = all_specs()
    assert "m_jpeg_decode_features" in specs
    assert specs["m_jpeg_decode_features"].oracle == JPEG_ORACLE
