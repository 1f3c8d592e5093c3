"""Mechanism tests for operators/quality.py (SURVEY E124 — trained
quality classifier): feature hashing, label rules, trainer
convergence and degenerate inputs. The end-to-end oracle parity
lives in tests/test_roundfifteen.py."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.operators.quality import (
    c4_weak_label,
    hashed_ngram_features,
    lexicon_weak_label,
    score_lr,
    train_quality_lr,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hashed_features_shape_and_bias(spark):
    docs = _docs(spark, [(1, "aa bb aa"), (2, ""), (3, "  ")])
    f = hashed_ngram_features(docs, n_buckets=64).collect()
    by_id = {}
    for r in f:
        by_id.setdefault(r["id"], []).append(r)
    # doc 1: grams = [aa, bb, aa, 'aa bb', 'bb aa'] -> n_d = 5
    d1 = {r["j"]: r["x"] for r in by_id[1]}
    assert d1.pop(64) == 1.0  # bias slot
    assert abs(sum(d1.values()) - 1.0) < 1e-12  # mean-normalized
    # empty/whitespace docs still get the bias row (and only it)
    for i in (2, 3):
        assert [(r["j"], r["x"]) for r in by_id[i]] == [(64, 1.0)]


def test_hashed_features_lowercase_and_bigrams(spark):
    docs = _docs(spark, [(1, "Foo BAR"), (2, "foo bar")])
    f = hashed_ngram_features(docs, n_buckets=256)
    slots = (
        f.groupBy("j")
        .agg(F.countDistinct("id").alias("n"))
        .filter("j < 256")
        .collect()
    )
    # case-folded docs hash identically: every slot has both docs
    assert slots and all(r["n"] == 2 for r in slots)


def test_lexicon_weak_label_threshold_and_empty(spark):
    docs = _docs(
        spark,
        [(1, "table scan table"), (2, "a b c d table"), (3, "")],
    )
    out = docs.select(
        "doc_id",
        lexicon_weak_label(docs, ("table", "scan"), 0.5).alias("y"),
    ).collect()
    got = {r["doc_id"]: r["y"] for r in out}
    assert got == {1: 1.0, 2: 0.0, 3: 0.0}


def test_c4_weak_label_rules(spark):
    docs = _docs(
        spark,
        [
            (1, "the quick brown fox jumps over dogs."),
            (2, "short"),
            (3, "curly brace { document with many words here now"),
            (4, "lorem ipsum dolor sit amet consectetur adipiscing"),
        ],
    )
    got = {
        r["doc_id"]: r["y"]
        for r in docs.select(
            "doc_id", c4_weak_label(docs).alias("y")
        ).collect()
    }
    assert got == {1: 1.0, 2: 0.0, 3: 0.0, 4: 0.0}


def test_trainer_learns_separable_concept(spark):
    # 40 docs, positives contain 'cat', negatives 'dog' — a linearly
    # separable concept the trainer must nail
    rows = []
    for i in range(20):
        rows.append((i, f"cat alpha beta w{i % 7}"))
        rows.append((100 + i, f"dog alpha beta w{i % 7}"))
    docs = _docs(spark, rows)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") < 100, 1.0).otherwise(0.0).alias("y"),
    )
    feats = hashed_ngram_features(docs, n_buckets=128)
    w = train_quality_lr(feats, labels, n_buckets=128, steps=12)
    pred = score_lr(feats, w).select(
        "id", (F.round("z", 4) > 0).alias("p")
    )
    got = pred.join(labels, "id").collect()
    acc = sum(bool(r["p"]) == (r["y"] == 1.0) for r in got) / len(got)
    assert acc == 1.0, acc


def test_trainer_monotone_under_overrelaxation(spark):
    # the MM + omega<2 guarantee: more steps never flips a perfectly
    # separated fit back to degenerate all-one-class predictions
    rows = [(i, "cat x") for i in range(10)] + [
        (100 + i, "dog x") for i in range(10)
    ]
    docs = _docs(spark, rows)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") < 100, 1.0).otherwise(0.0).alias("y"),
    )
    feats = hashed_ngram_features(docs, n_buckets=64)
    for steps in (4, 8, 16):
        w = train_quality_lr(feats, labels, n_buckets=64, steps=steps)
        preds = {
            r["id"]: bool(r["p"])
            for r in score_lr(feats, w)
            .select("id", (F.round("z", 4) > 0).alias("p"))
            .collect()
        }
        assert all(preds[i] for i in range(10))
        assert not any(preds[100 + i] for i in range(10))


def test_trainer_empty_and_single_class(spark):
    docs = _docs(spark, [])
    labels = docs.select(
        F.col("doc_id").alias("id"), F.lit(1.0).alias("y")
    )
    feats = hashed_ngram_features(docs, n_buckets=32)
    w = train_quality_lr(feats, labels, n_buckets=32, steps=3)
    assert w == [0.0] * 33

    docs = _docs(spark, [(1, "a b"), (2, "c d")])
    labels = docs.select(
        F.col("doc_id").alias("id"), F.lit(1.0).alias("y")
    )
    feats = hashed_ngram_features(docs, n_buckets=32)
    w = train_quality_lr(feats, labels, n_buckets=32, steps=3)
    # all-positive labels: finite smoothed prior, all predictions 1
    assert all(math.isfinite(v) for v in w)
    z = score_lr(feats, w).collect()
    assert all(r["z"] > 0 for r in z)


def test_score_lr_zero_weights_is_zero(spark):
    docs = _docs(spark, [(1, "a b c")])
    feats = hashed_ngram_features(docs, n_buckets=32)
    z = score_lr(feats, [0.0] * 33).collect()
    assert len(z) == 1 and z[0]["z"] == 0.0


def test_bucket_hash_matches_duckdb(spark):
    import duckdb

    words = ["table", "Query", "join scan", "ünïcode", "x" * 50]
    docs = spark.createDataFrame(
        [(w,) for w in words], "w string"
    ).select(
        "w",
        (
            F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long")
            % 1024
        ).alias("j"),
    )
    got = {r["w"]: r["j"] for r in docs.collect()}
    con = duckdb.connect()
    for w in words:
        (j,) = con.sql(
            "SELECT CAST(concat('0x', substr(md5(?), 1, 8)) AS BIGINT)"
            " % 1024",
            params=[w],
        ).fetchone()
        assert got[w] == j, w


def test_model_save_load_roundtrip_and_rollback(spark, tmp_path):
    """The production train/serve split: weights persist as a
    versioned SnapshotTable; a fresh session loads and scores
    identically with no retrain; time travel rolls a model back."""
    from turnover_odata_etl_spark.operators.quality import (
        load_quality_model,
        save_quality_model,
    )
    from turnover_odata_etl_spark.storage import SnapshotTable

    rows = [(i, "cat x") for i in range(5)] + [
        (100 + i, "dog x") for i in range(5)
    ]
    docs = _docs(spark, rows)
    labels = docs.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") < 100, 1.0).otherwise(0.0).alias("y"),
    )
    feats = hashed_ngram_features(docs, n_buckets=64)
    w1 = train_quality_lr(feats, labels, n_buckets=64, steps=6)
    mdir = str(tmp_path / "qmodel")
    sid1 = save_quality_model(spark, mdir, w1, version=1)
    assert load_quality_model(spark, mdir) == w1

    # scores from the loaded model are identical to the in-session fit
    a = {r["id"]: r["z"] for r in score_lr(feats, w1).collect()}
    b = {
        r["id"]: r["z"]
        for r in score_lr(feats, load_quality_model(spark, mdir)).collect()
    }
    assert a == b

    # a second version lands as a new commit; rollback via time travel
    w2 = [v * 2 for v in w1]
    save_quality_model(spark, mdir, w2, version=2)
    assert load_quality_model(spark, mdir) == w2
    t = SnapshotTable(
        spark, mdir, key_cols=["j"], order_col="ver", n_buckets=1
    )
    assert t.latest_property("quality.version") == "2"
    old = {
        int(r["j"]): r["w"]
        for r in t.read(snapshot_id=sid1).select("j", "w").collect()
    }
    assert [old[j] for j in sorted(old)] == w1
