"""Round-12 STAGED queries (plans/roundtwelve.py) — oracle parity +
mechanism deep-dives, run every session while the queries await a cap
ruling (registry frozen at 206 by the r11 verdict)."""

from __future__ import annotations

import math

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.operators.retrieval import bm25_topk
from turnover_odata_etl_spark.plans.roundtwelve import (
    BM25_ORACLE,
    STAGED,
    t_bm25_topk,
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
    assert set(STAGED) == {"t_bm25_topk"}
    for spec in STAGED.values():
        assert spec.oracle and spec.oracle.strip()


def test_bm25_topk_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        t_bm25_topk(spark, sf_dir),
        _con(sf_dir),
        BM25_ORACLE,
        "t_bm25_topk",
    )


def test_bm25_hand_corpus(spark):
    """Independent arithmetic: the Lucene-form BM25 computed by hand
    in the test must match the operator to the 4dp grid, including
    the tf-saturation/length-normalization ordering (d1 beats d2 on
    tf despite being longer)."""
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y y y"), (4, "z")],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(0, "x")], "query_id long, term string")
    got = {
        (r["query_id"], r["doc_id"]): (r["score"], r["rn"])
        for r in bm25_topk(docs, q).collect()
    }

    def score(tf, dl, df, n=4.0, avgdl=9 / 4, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        return round(
            idf * tf / (tf + k1 * (1 - b + b * dl / avgdl)), 4
        )

    assert got == {
        (0, 1): (score(2, 3, 2), 1),
        (0, 2): (score(1, 2, 2), 2),
    }
    assert got[(0, 1)][0] > got[(0, 2)][0]


def test_bm25_df_not_inflated_by_query_overlap(spark):
    """Two queries sharing a term must not double that term's df (the
    postings restriction joins per (query, term) — df is counted on
    DISTINCT docs)."""
    docs = spark.createDataFrame(
        [(1, "x x y"), (2, "x z"), (3, "y y y"), (4, "z")],
        "doc_id long, text string",
    )
    q1 = spark.createDataFrame(
        [(0, "x")], "query_id long, term string"
    )
    q2 = spark.createDataFrame(
        [(0, "x"), (1, "x"), (1, "z")], "query_id long, term string"
    )
    solo = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, q1).collect()
    }
    both = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(docs, q2)
        .filter("query_id = 0")
        .collect()
    }
    assert solo == both


def test_bm25_no_hit_queries_vanish_and_k_caps(spark):
    docs = spark.createDataFrame(
        [(i, "common tok" + str(i % 3)) for i in range(12)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "common"), (1, "missingterm")],
        "query_id long, term string",
    )
    out = bm25_topk(docs, q, k=5).collect()
    assert {r["query_id"] for r in out} == {0}
    assert len(out) == 5  # k caps the 12 matching docs
    assert [r["rn"] for r in sorted(out, key=lambda r: r["rn"])] == [
        1, 2, 3, 4, 5,
    ]


def test_bm25_repeat_call_deterministic(spark, sf_dir):
    a = sorted(map(tuple, t_bm25_topk(spark, sf_dir).collect()))
    b = sorted(map(tuple, t_bm25_topk(spark, sf_dir).collect()))
    assert a == b
