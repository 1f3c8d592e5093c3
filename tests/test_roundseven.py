"""Round-7 staging queries (plans/roundseven.py) — oracle-tested every
session even though they are not registered (the round-6 registry
holds at 178 so the ledger-closing gate window stays intact).
Activation checklist lives in the module docstring."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.registry import all_specs
from turnover_odata_etl_spark.plans.roundseven import (
    BPE_TOKENIZE_ORACLE,
    PNG_ADAM7_ORACLE,
    m_png_adam7_decode_features,
    t_bpe_tokenize_ids,
)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_png_adam7_decode_features_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        m_png_adam7_decode_features(spark, sf_dir),
        _con(sf_dir),
        PNG_ADAM7_ORACLE,
        "m_png_adam7_decode_features",
    )


def test_bpe_tokenize_ids_matches_oracle(spark, sf_dir):
    assert BPE_TOKENIZE_ORACLE  # eager constant, never None
    compare_spark_vs_oracle(
        t_bpe_tokenize_ids(spark, sf_dir),
        _con(sf_dir),
        BPE_TOKENIZE_ORACLE,
        "t_bpe_tokenize_ids",
    )


def test_roundseven_is_registered_and_cap_frozen():
    """Round 7 activated the staging module (VERDICT r06 cap ruling:
    register all three); round 8 moved the cap to 191 per the r07
    ruling, so the count assertion lives in test_roundeight now."""
    specs = all_specs()
    assert "m_png_adam7_decode_features" in specs
    assert "m_adpcm_decode_features" in specs
    assert "t_bpe_tokenize_ids" in specs
    assert "st_snapshot_merge" in specs  # VERDICT r06 item 3 Done criterion


def test_adpcm_decode_features_matches_oracle(spark, sf_dir):
    from turnover_odata_etl_spark.plans.roundseven import (
        ADPCM_ORACLE,
        m_adpcm_decode_features,
    )

    compare_spark_vs_oracle(
        m_adpcm_decode_features(spark, sf_dir),
        _con(sf_dir),
        ADPCM_ORACLE,
        "m_adpcm_decode_features",
    )
