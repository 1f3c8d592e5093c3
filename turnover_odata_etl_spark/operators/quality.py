"""Trained quality classifier — the fastText-style binary curation
model (SURVEY E124; VERDICT r14 item 5).

Public pattern: Joulin et al. 2016, "Bag of Tricks for Efficient Text
Classification" (fastText), as deployed in CCNet / GPT-3 / LLaMA-style
curation stacks as the learned quality stage between language
identification (E110, ``operators/langid.py``) and deduplication
(E8): hashed bag-of-n-gram features + a linear classifier, trained on
weak labels and scored corpus-wide as a map pass.

Design, Spark-first:

- **Features are the hashing trick** (no vocabulary): every word
  unigram/bigram hashes into one of ``n_buckets`` feature slots via
  md5 (``conv(substr(md5(g),1,8),16,10) % D`` — deterministic,
  engine-portable, collision-tolerant by construction). The model is
  therefore a fixed D-vector regardless of corpus size: at 100 TB the
  broadcast stays O(D), and feature building is one scan + one
  shuffle to the (doc, bucket) grain.
- **Counts are mean-normalized** (x_j = count_j / n_tokens, the
  fastText averaging), plus a constant bias slot ``j = D``.
- **Training is T deterministic FULL-BATCH majorized-Newton steps**
  — quadratic majorization (MM) of the logistic loss with the
  separable Jacobi bound, the device that makes SIMULTANEOUS
  per-coordinate Newton steps provably monotone where plain gradient
  descent and raw diagonal Newton both oscillate on correlated
  bag-of-n-gram features (every feature in a doc couples with every
  other through that doc's margin). The curvature bound

      H  ⪯  ¼ XᵀX  ⪯  ¼ diag(Σ_d x_dj · S_d),   S_d = Σ_j x_dj

  (σ′ ≤ ¼, then Gershgorin on the nonnegative feature matrix) is
  p-independent, so the per-slot denominator is computed ONCE;
  each step then needs only the gradient aggregate:

      hess_j = ¼ Σ_d x_dj · S_d                  (one-time)
      grad_j = Σ_d x_dj · (y_d − p_d)            (per step)
      w_j   += ω · grad_j / (hess_j + λ)

  with over-relaxation ω = 1.8: for ANY global quadratic majorant
  B ⪰ H the descent lemma gives loss decrease (ω − ω²/2)·gᵀB⁻¹g > 0
  for every ω ∈ (0, 2), so the accelerated iteration stays provably
  monotone while converging ~ω× faster than the plain MM step —

  from w = 0 except the bias, which starts at the smoothed prior
  log-odds b₀ = ln((Σy + ½)/(N − Σy + ½)) — the intercept's exact
  solution under an empty model, so the iterations spend their
  budget on the discriminative weights instead of crawling the
  class-prior shift through the conservative MM bound (step 1 then
  has p_d = σ(b₀) for every doc, constant — no margin pass needed). No RNG, no row-order dependence beyond float-sum ulps; only
  the D-sized gradient frame ever reaches the driver. Full-batch
  (not SGD) is the choice that makes the fit closed-form replayable
  by a SQL oracle — the t_langid_confusion/t_dsir_importance
  exactness class — while staying one-job-per-step distributed.
- **Scoring** is a broadcast join of the D-row weight frame against
  the feature frame: zero additional shuffles beyond the per-doc
  sum, no Python on the data path.

The reference (src/etl.py) has no ML stage at all; this implements
the public curation pattern its corpus-ETL shape feeds at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TXT

__all__ = [
    "hashed_ngram_features",
    "train_quality_lr",
    "score_lr",
    "c4_weak_label",
    "lexicon_weak_label",
    "save_quality_model",
    "load_quality_model",
]


def _bucket(col: Column, n_buckets: int) -> Column:
    """md5-based feature hashing: first 8 hex chars as an unsigned
    32-bit int, mod ``n_buckets``. Engine-portable (DuckDB:
    ``CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % D``)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 512,
) -> DataFrame:
    """Hashed bag-of-n-grams features: ``(id, j, x)`` rows where
    ``j ∈ [0, n_buckets)`` is the hashed slot of each lowercased word
    unigram/bigram and ``x`` is the slot's count divided by the doc's
    total gram count, plus one bias row ``(id, n_buckets, 1.0)`` per
    doc (so zero-token docs still score). One scan, one explode, one
    shuffle to (id, j)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.transform(TXT.tokens(text_col), lambda t: F.lower(t)).alias(
            "ws"
        ),
    )
    grams = toks.select(
        "id",
        F.concat(
            F.col("ws"),
            F.when(
                F.size("ws") >= 2,
                F.zip_with(
                    F.slice("ws", 1, F.size("ws") - 1),
                    F.expr("slice(ws, 2, size(ws) - 1)"),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                ),
            ).otherwise(F.array().cast("array<string>")),
        ).alias("gs"),
    )
    counts = (
        grams.select(
            "id",
            F.size("gs").alias("n_d"),
            F.explode("gs").alias("g"),
        )
        .groupBy("id", "n_d", _bucket(F.col("g"), n_buckets).alias("j"))
        .agg(F.count(F.lit(1)).alias("c"))
        .select(
            "id", "j", (F.col("c") / F.col("n_d")).alias("x")
        )
    )
    bias = docs.select(
        F.col(id_col).alias("id"),
        F.lit(n_buckets).cast("long").alias("j"),
        F.lit(1.0).alias("x"),
    )
    return counts.unionByName(bias)


def c4_weak_label(docs: DataFrame, text_col: str = "text") -> Column:
    """The C4-style quality rule (E17, t_quality_filter_c4) as a 0/1
    DOUBLE weak label — the standard bootstrap for a quality
    classifier when no hand-labeled set exists (CCNet uses Wikipedia
    as the positive class; here the rule plays that role so the fit
    is corpus-self-contained and oracle-replayable)."""
    toks = TXT.tokens(text_col)
    n_words = F.size(toks)
    mean_wl = F.when(
        F.size(toks) > 0,
        F.round(
            F.expr(
                "aggregate(transform("
                f"  CASE WHEN trim({text_col}) = '' THEN array() "
                f"  ELSE split(trim({text_col}), '\\\\s+') END,"
                "  x -> length(x)), 0L, (a, x) -> a + x)"
            )
            / F.size(toks),
            4,
        ),
    ).otherwise(F.lit(0.0))
    keep = (
        (n_words >= 5)
        & (mean_wl >= 3)
        & (mean_wl <= 10)
        & ~(
            F.col(text_col).contains("{")
            | F.col(text_col).contains("}")
        )
        & ~F.lower(F.col(text_col)).contains("lorem ipsum")
    )
    return F.when(keep, F.lit(1.0)).otherwise(F.lit(0.0))


def lexicon_weak_label(
    docs: DataFrame,
    lexicon: "tuple[str, ...]",
    threshold: float,
    text_col: str = "text",
) -> Column:
    """Seed-lexicon weak label — the CCNet bootstrap: a doc is a
    positive when its (rounded) fraction of tokens drawn from a small
    target lexicon reaches ``threshold``. This is the standard way a
    quality/domain classifier is bootstrapped without hand labels:
    the heuristic seeds the labels, the trained model GENERALIZES the
    lexicon into hashed feature space (learning correlated tokens the
    seed list never mentioned) and replaces the heuristic at scoring
    time. 0/1 DOUBLE column; zero-token docs are negatives."""
    toks = TXT.tokens(text_col)
    lex = F.array(*[F.lit(w) for w in lexicon])
    ratio = F.when(
        F.size(toks) > 0,
        F.round(
            F.size(
                F.filter(
                    toks, lambda t: F.array_contains(lex, F.lower(t))
                )
            )
            / F.size(toks),
            4,
        ),
    ).otherwise(F.lit(-1.0))
    return F.when(ratio >= F.lit(threshold), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )


def _weights_frame(spark: SparkSession, w: "list[float]") -> DataFrame:
    """D-row (j, w) frame. Built from a pandas frame so the Arrow
    fast path ships it as ONE record batch (round 16, guide §6
    "Arrow for driver transfers"): the tuple-list form pickled 1025
    rows through Py4J on EVERY training step — measured ~0.18 s of
    pure driver time per step, ~4.4 s of the 24-step fit at sf0.1.
    (With Arrow disabled, pyspark converts the pandas frame row-wise
    instead — same values, just without the fast path.)"""
    import numpy as np
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(
            {
                "j": np.arange(len(w), dtype="int64"),
                "w": np.asarray(w, dtype="float64"),
            }
        ),
        "j long, w double",
    )


def train_quality_lr(
    feats: DataFrame,
    labels: DataFrame,
    n_buckets: int = 512,
    steps: int = 2,
    ridge: float = 1e-3,
    omega: float = 1.8,
) -> "list[float]":
    """Fit binary logistic regression by ``steps`` full-batch
    diagonal-Newton steps from w = 0 (see the module docstring for
    the update). ``feats`` is the sparse (id, j, x) frame
    (``hashed_ngram_features``); ``labels`` carries (id, y) with
    y ∈ {0.0, 1.0}. ``ridge`` is the Hessian-diagonal damping (λ).
    Returns the dense (D+1)-float weight list (bias last).

    Each step runs as one Spark job: join feats to the broadcast
    D-row weight frame, per-doc margin sum, sigmoid, residual, then
    the per-slot gradient aggregate — only that D-sized frame ever
    reaches the driver (the majorized curvature is p-independent, so
    it is aggregated once up front). Step 1 skips the margin job
    entirely (w = 0 ⇒ p = ½ for every doc, exactly — one fewer
    pass, identical numbers)."""
    import math

    spark = feats.sparkSession
    stats = labels.agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    ).first()
    n, sy = int(stats["n"]), float(stats["sy"] or 0.0)
    if n == 0:
        return [0.0] * (n_buckets + 1)
    w = [0.0] * (n_buckets + 1)
    w[n_buckets] = math.log((sy + 0.5) / (n - sy + 0.5))
    p0 = 1.0 / (1.0 + math.exp(-w[n_buckets]))
    s = feats.groupBy(F.col("id").alias("sid")).agg(
        F.sum("x").alias("s")
    )
    # Persist PRE-PARTITIONED on id (VERDICT r15 item 7): every
    # step's margin aggregation groups the broadcast-joined frame on
    # id and its residual join keys on id — with the cache laid out
    # as hashpartitioning(id), both reuse the cached exchange and
    # each step stops re-shuffling the full feature frame (~2 fewer
    # fl-sized exchanges per step; the j-grain gradient aggregate
    # keeps its cheap partial-agg shuffle). Measured A/B in
    # BASELINE.md round 16.
    # Partition count sized to the CORPUS, not the session constant
    # (round 16, guide §2.2/§2.5 "scale-adaptive partitioning"): each
    # of the `steps` sequential jobs re-reads this cache, so its
    # partition count is a per-step task-scheduling multiplier. Small
    # fits get a partition per ~2k docs (the 5k-doc sf0.1 fit runs 3
    # tasks/step instead of 32 — measured 18.6 → 11.0 s); mid-size
    # corpora rise to full cluster parallelism; huge corpora outgrow
    # it at ~50k docs/partition so per-task state stays bounded.
    n_parts = min(
        max(1, -(-n // 2000)),
        max(
            spark.sparkContext.defaultParallelism,
            -(-n // 50_000),
        ),
    )
    fl = (
        feats.join(labels, feats["id"] == labels["id"], "inner")
        .join(s, feats["id"] == s["sid"])
        .select(feats["id"].alias("id"), "j", "x", "y", "s")
        .repartition(n_parts, "id")
        # Sorted WITHIN the cached partitions (round 16): the cache
        # reports its child's ordering, so every step's per-doc
        # margin window reuses it — the sort is paid once at cache
        # build instead of once per step (guide §2.4: establish the
        # partitioning/ordering once, let every keyed step share it).
        .sortWithinPartitions("id")
        .persist()
    )
    try:
        hess = {
            int(r["j"]): float(r["h"])
            for r in fl.groupBy("j")
            .agg((F.lit(0.25) * F.sum(F.col("x") * F.col("s"))).alias("h"))
            .collect()
        }
        for step in range(steps):
            if step == 0:
                resid = fl.select(
                    "id", "j", "x", (F.col("y") - F.lit(p0)).alias("r")
                )
            else:
                # Per-doc margin as a WINDOW sum over the cache's own
                # hashpartitioning(id) layout (round 16, guide §2.4:
                # an operation keyed like the established partitioning
                # needs no second exchange). The previous shape
                # aggregated to a per-doc frame and sort-merge-joined
                # it back onto fl — a second full pass over the
                # feature frame plus a join, every step. The window
                # computes the same Σ_j x·w per doc in the SAME pass
                # that reads fl: one broadcast join, one intra-
                # partition sort on id, zero joins, zero extra
                # corpus-sized exchanges per step.
                from pyspark.sql import Window as _W

                wf = F.broadcast(_weights_frame(spark, w))
                z = F.sum(F.col("x") * F.col("w")).over(
                    _W.partitionBy("id")
                )
                p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
                resid = fl.join(wf, "j").select(
                    "id", "j", "x", (F.col("y") - p).alias("r")
                )
            grad = (
                resid.groupBy("j")
                .agg(F.sum(F.col("x") * F.col("r")).alias("g"))
                .collect()
            )
            for row in grad:
                j = int(row["j"])
                w[j] += omega * float(row["g"]) / (hess[j] + ridge)
    finally:
        fl.unpersist()
    return w


def save_quality_model(
    spark: SparkSession,
    table_dir: str,
    weights: "list[float]",
    version: int = 1,
) -> int:
    """Persist a trained weight vector as a versioned
    :class:`..storage.SnapshotTable` (keyed j, one commit per model
    version) — the production split: training runs at maintenance
    cadence, scoring sessions ``load_quality_model`` the D-row frame
    off disk with no retrain and no session state. Time travel gives
    model rollback for free; the ``quality.version`` property stamps
    provenance. Returns the snapshot id."""
    from ..storage import SnapshotTable

    t = SnapshotTable(
        spark, table_dir, key_cols=["j"], order_col="ver", n_buckets=1
    )
    df = spark.createDataFrame(
        [(int(j), float(w), int(version)) for j, w in enumerate(weights)],
        "j long, w double, ver long",
    )
    props = {
        "quality.version": str(int(version)),
        "quality.dim": str(len(weights) - 1),
    }
    if t.current_id() is None:  # overwrite refuses on an empty table
        return t.append(df, properties=props)
    return t.overwrite(df, properties=props)


def load_quality_model(
    spark: SparkSession, table_dir: str
) -> "list[float]":
    """The dense weight list back from :func:`save_quality_model`
    (latest version) — a D-row metadata read."""
    from ..storage import SnapshotTable

    t = SnapshotTable(
        spark, table_dir, key_cols=["j"], order_col="ver", n_buckets=1
    )
    rows = t.read().select("j", "w").collect()
    if not rows:
        raise ValueError(f"load_quality_model: no model at {table_dir}")
    w = [0.0] * (max(int(r["j"]) for r in rows) + 1)
    for r in rows:
        w[int(r["j"])] = float(r["w"])
    return w


def score_lr(
    feats: DataFrame, weights: "list[float]"
) -> DataFrame:
    """Score every doc against a trained weight vector: one broadcast
    join + per-doc sum. Returns (id, z) — the caller thresholds
    (``round(z, 4) > 0`` is the engine-portable decision grid)."""
    spark = feats.sparkSession
    wf = F.broadcast(_weights_frame(spark, list(weights)))
    return (
        feats.join(wf, "j")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("z"))
    )
