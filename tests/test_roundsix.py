"""Round-6 staging queries (plans/roundsix.py) — tested every session
even though they are not yet registered (inventory freeze, r04
verdict). Activation checklist lives in the module docstring."""

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


def test_roundsix_is_not_registered_yet():
    """The staging module must not leak into the driver contract while
    the round-5 inventory freeze holds (registry == 174)."""
    specs = all_specs()
    assert "m_jpeg_decode_features" not in specs
    assert len(specs) == 174
