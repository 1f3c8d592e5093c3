"""Round-11 queries (plans/roundeleven.py, REGISTERED round 12 per
the r11 cap ruling) — oracle parity + mechanism deep-dives."""

from __future__ import annotations

import duckdb

from .oracle_utils import compare_spark_vs_oracle
from turnover_odata_etl_spark.plans.roundeleven import (
    LANGID_ORACLE,
    t_langid_confusion,
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


def test_roundeleven_specs_registered_with_oracles():
    from turnover_odata_etl_spark.plans import registry

    specs = registry.all_specs()
    for name in ("t_langid_confusion", "s_snapshot_dml_lifecycle"):
        assert name in specs
        assert specs[name].oracle and specs[name].oracle.strip()


def test_langid_confusion_matches_oracle(spark, sf_dir):
    compare_spark_vs_oracle(
        t_langid_confusion(spark, sf_dir),
        _con(sf_dir),
        LANGID_ORACLE,
        "t_langid_confusion",
    )


def test_langid_separates_fixture_languages(spark, sf_dir):
    """Directional sanity on the MATH (parity alone would accept a
    degenerate everything-is-en model): on the fixture — whose
    languages have distinct characteristic vocabularies — the
    confusion matrix must be strongly diagonal (≥ 90% accuracy)."""
    got = t_langid_confusion(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in got)
    if total < 50:
        return  # tiny fixture — parity test covers it
    diag = sum(r["n_docs"] for r in got if r["lang"] == r["pred_lang"])
    assert diag / total >= 0.9, got


def test_langid_hand_corpus(spark):
    """Hand-checkable end-to-end: two 'languages' with disjoint
    trigram inventories; a doc written in each language's vocabulary
    must classify to it, including the SHORT ambiguous doc whose
    smoothed score still favors its own language."""
    from turnover_odata_etl_spark.operators.langid import (
        fit_langid,
        score_langid,
    )

    rows = [
        (1, "aaa aab aba aaa baa aab", "xx"),
        (2, "aab aaa aba baa aaa aaa", "xx"),
        (3, "zzz zzy zyz zzz yzz zzy", "yy"),
        (4, "zzy zzz zyz yzz zzz zzz", "yy"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = fit_langid(df, "text", "lang", n=3, alpha=0.5)
    pred = {
        r["doc_id"]: r["pred_lang"]
        for r in score_langid(df, model, "text", "doc_id").collect()
    }
    assert pred == {1: "xx", 2: "xx", 3: "yy", 4: "yy"}

    probes = spark.createDataFrame(
        [(10, "aaa aba"), (11, "zzz zyz"), (12, "ab")],  # 12: too short
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["pred_lang"]
        for r in score_langid(probes, model, "text", "doc_id").collect()
    }
    assert got == {10: "xx", 11: "yy"}  # sub-n doc is unclassifiable


def test_langid_shared_gram_pass_is_equivalent(spark):
    """The activation optimization (VERDICT r11 item 2): one persisted
    doc_gram_counts frame fed to BOTH fit and score must produce
    byte-identical predictions to the two-independent-passes form —
    including under max_features selection."""
    from turnover_odata_etl_spark.operators.langid import (
        doc_gram_counts,
        fit_langid,
        score_langid,
    )

    rows = [
        (1, "aaa aab aba aaa baa aab", "xx"),
        (2, "aab aaa aba baa aaa aaa", "xx"),
        (3, "zzz zzy zyz zzz yzz zzy", "yy"),
        (4, "zzy zzz zyz yzz zzz zzz", "yy"),
        (5, "ab", "xx"),  # sub-n — must drop from BOTH forms
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def run(shared, max_features):
        if shared:
            g = doc_gram_counts(df, "text", 3, ["doc_id", "lang"])
            model = fit_langid(
                df, "text", "lang", n=3, alpha=0.5,
                max_features=max_features, grams=g,
            )
            pred = score_langid(df, model, "text", "doc_id", grams=g)
        else:
            model = fit_langid(
                df, "text", "lang", n=3, alpha=0.5,
                max_features=max_features,
            )
            pred = score_langid(df, model, "text", "doc_id")
        return sorted(
            (r["doc_id"], r["pred_lang"], r["n_grams"])
            for r in pred.collect()
        )

    for mf in (None, 5):
        assert run(True, mf) == run(False, mf), f"max_features={mf}"


def test_langid_unseen_grams_are_ignored(spark):
    """Grams outside the training vocabulary must carry no signal —
    a probe that is half known-xx grams and half never-seen grams
    still classifies as xx on both the operator and the model math."""
    from turnover_odata_etl_spark.operators.langid import (
        fit_langid,
        score_langid,
    )

    df = spark.createDataFrame(
        [(1, "aaa aab aba", "xx"), (2, "zzz zzy zyz", "yy")],
        "doc_id long, text string, lang string",
    )
    model = fit_langid(df, "text", "lang", n=3, alpha=0.5)
    probe = spark.createDataFrame(
        [(7, "aaa QQQ WWW aab")], "doc_id long, text string"
    )
    out = score_langid(probe, model, "text", "doc_id").collect()
    assert len(out) == 1 and out[0]["pred_lang"] == "xx"
    # n_grams counts only IN-VOCABULARY gram tokens
    assert out[0]["n_grams"] < 14


def test_dml_lifecycle_matches_oracle(spark, sf_dir):
    from turnover_odata_etl_spark.plans.roundeleven import (
        DML_LIFECYCLE_ORACLE,
        s_snapshot_dml_lifecycle,
    )

    compare_spark_vs_oracle(
        s_snapshot_dml_lifecycle(spark, sf_dir),
        _con(sf_dir),
        DML_LIFECYCLE_ORACLE,
        "s_snapshot_dml_lifecycle",
    )
