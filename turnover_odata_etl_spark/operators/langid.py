"""Language identification — char-n-gram Naive Bayes, trained
in-Spark (round 11, VERDICT r10 item 3 / SURVEY E110).

The one standard corpus-curation stage the ladder lacked: CCNet/C4
pipelines run langid BEFORE quality filtering, dedup, and selection.
Shipping pretrained fastText weights is not DuckDB-replayable (and not
"trained in-Spark"); the published classical alternative — a character
n-gram multinomial Naive Bayes (Cavnar & Trenkle 1994's n-gram
profiles, done generatively) — is exact, closed-form, and fits as TWO
conditional aggregations, so the whole fit+score composes into one
Catalyst plan an oracle can replay.

Model (add-α smoothing over the JOINT gram vocabulary V):

    score(d, L) = ln p̂(L)
                + Σ_{g ∈ d, c(L,g)>0} k_g · ln(c(L,g) + α)
                + (n_d − n_present) · ln(α)
                − n_d · ln(tot_L + α·|V|)

with k_g the gram's multiplicity in d, n_d = Σ k_g over grams of d
that exist in V (grams never seen in training carry no signal and are
ignored — both engines identically), n_present the portion with
c(L,g) > 0. The winner is the argmax over languages of the
LENGTH-NORMALIZED score rounded to the 4dp grid, language ascending on
ties — the cross-engine determinism device every scored query here
uses (sum-order ulps can never flip a decision both engines agree on
at 4dp).

Scale shape: the fit is one (lang, gram) aggregation whose output is
vocab-sized (Heaps' law — sublinear in corpus) plus a language-count
frame; scoring joins the BROADCAST model into the doc-gram frame and
aggregates at (doc, lang) grain — the corpus crosses the wire once, on
doc_id, never on gram. The per-language frames are 1-row-per-language
crossJoins (bounded by the label alphabet, adjudicated in PLANS.md).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _char_grams(df: DataFrame, text_col: str, n: int, keep: list[str]) -> DataFrame:
    """(keep..., g): one row per char n-gram TOKEN (with multiplicity)
    of the normalized text — lowercased, whitespace runs collapsed to
    single spaces, trimmed; docs shorter than ``n`` chars drop out.
    The normalized string is materialized behind a Generate boundary
    (``explode(array(...))``) so the gram transform's lambda reads an
    attribute, not an expression CollapseProject would re-evaluate per
    gram (the O(len²) HOF trap, plans/llm._with_tk)."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    docs = df.select(
        *keep, F.explode(F.array(norm)).alias("__t")
    ).filter(F.length("__t") >= n)
    return docs.select(
        *keep,
        F.explode(
            F.expr(
                f"transform(sequence(1, length(__t) - {n - 1}),"
                f" i -> substring(__t, i, {n}))"
            )
        ).alias("g"),
    )


def doc_gram_counts(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """(keep..., g, k): per-document char-n-gram multiplicities — the
    ONE corpus gram pass both :func:`fit_langid` and
    :func:`score_langid` accept precomputed (VERDICT r11 item 2), so
    fit + score over the same corpus can explode/shuffle grams once.

    When it pays (MEASURED, sf0.1, warm A/B — BASELINE.md round 12):
    only when gram multiplicity collapses this frame well below token
    grain (small ``n``, repetitive text). At n=10 grams are nearly
    all unique (k≈1), the frame is token-sized, and sharing is
    1.3–1.9× SLOWER than two independent passes: it converts the
    fit's map-side-combined (lang, g) aggregation — which never
    exchanges token-grain data — into a write + double-read of a
    token-grain exchange. Measure per shape before wiring it in.

    Contract: ``keep`` must lead with a column that functionally
    determines the rest (the document id determines its label), so
    ``(keep[0], g)`` is already unique and the scorer can reuse the
    frame without re-aggregating."""
    return (
        _char_grams(df, text_col, n, keep)
        .groupBy(*keep, "g")
        .agg(F.count(F.lit(1)).alias("k"))
    )


@dataclass
class LangidModel:
    """Lazy model frames (the fit is declared, not materialized —
    score composes fit + inference into ONE Catalyst plan):

    - ``counts``: (lang, g, c) sparse gram counts — vocab-sized;
    - ``klass``: (lang, tot, lp_prior) per-language gram totals and
      log class priors — one row per language;
    - ``vocab``: 1-row frame carrying |V| (the joint vocabulary size).
    """

    counts: DataFrame
    klass: DataFrame
    vocab: DataFrame
    n: int
    alpha: float


def fit_langid(
    df: DataFrame,
    text_col: str,
    label_col: str,
    n: int = 3,
    alpha: float = 0.5,
    max_features: int | None = None,
    grams: DataFrame | None = None,
) -> LangidModel:
    """Fit the char-n-gram NB model from labeled documents. One
    corpus pass feeding two conditional aggregations; every output
    frame is vocab- or alphabet-sized.

    ``max_features`` caps the model at the top-K grams by global
    frequency (count descending, gram ascending — a total order, so
    the selection is deterministic and oracle-replayable). This is the
    feature-selection step every production langid runs (langid.py /
    fastText train against selected or hashed feature sets): without
    it the raw n-gram vocabulary grows with the corpus and the
    "model broadcasts" scale claim quietly dies at 100 TB; with it
    the model is K-sized forever. Grams outside the selection carry
    no signal at scoring time — documents none of whose grams
    survived selection are unclassifiable and drop out, same rule as
    sub-``n`` documents.

    ``grams`` (optional): a precomputed :func:`doc_gram_counts` frame
    whose keep columns include ``label_col`` and that was built with
    the SAME ``text_col``/``n`` — when fit and score run over the same
    corpus, computing it once (persisted) halves the corpus gram
    scans. When omitted the pass is computed here."""
    if grams is not None:
        counts = (
            grams.groupBy(F.col(label_col).alias("lang"), "g")
            .agg(F.sum("k").cast("long").alias("c"))
        )
    else:
        tok = _char_grams(df, text_col, n, [label_col]).select(
            F.col(label_col).alias("lang"), "g"
        )
        counts = tok.groupBy("lang", "g").agg(
            F.count(F.lit(1)).alias("c")
        )
    if max_features is not None:
        # vocab-sized input, K-sized output: a distributed TakeOrdered
        # over the global gram counts, never over the corpus
        sel = (
            counts.groupBy("g")
            .agg(F.sum("c").alias("gc"))
            .orderBy(F.desc("gc"), F.asc("g"))
            .limit(int(max_features))
            .select("g")
        )
        counts = counts.join(F.broadcast(sel), "g")
    # NOT persisted (round 16, measured): this model frame parents
    # ~4 broadcast subtrees that each re-derive the corpus gram
    # aggregation — but those builds run CONCURRENTLY in the
    # broadcast thread pool and overlap on idle cores (guide §2.6),
    # so the duplicated work costs no wall-clock, while a persist
    # serializes them behind the cache lock. Interleaved A/B at
    # sf0.1: persist 5.0–7.9 s vs unpersisted 4.6–5.3 s for
    # t_langid_confusion. Revisit only for a CPU-saturated cluster.
    tots = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    # priors over documents that SURVIVED normalization (length >= n)
    # — the population the gram model describes
    norm = F.trim(
        F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")
    )
    survivors = df.filter(F.length(norm) >= n)
    ndocs = survivors.groupBy(F.col(label_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    total = survivors.agg(F.count(F.lit(1)).alias("ntot"))
    klass = (
        tots.join(ndocs, "lang")
        .join(F.broadcast(total))
        .select(
            "lang",
            "tot",
            F.log(F.col("nd") / F.col("ntot")).alias("lp_prior"),
        )
    )
    vocab = counts.agg(
        F.count_distinct("g").cast("long").alias("v")
    )
    return LangidModel(
        counts=counts, klass=klass, vocab=vocab, n=n, alpha=alpha
    )


def score_langid(
    df: DataFrame,
    model: LangidModel,
    text_col: str,
    id_col: str,
    grams: DataFrame | None = None,
) -> DataFrame:
    """Classify every document: (id_col, pred_lang, n_grams). Docs
    shorter than ``n`` normalized chars are unclassifiable and drop
    out (same population rule as the fit). The model frames broadcast;
    the corpus shuffles once, on the document id.

    ``grams`` (optional): a precomputed :func:`doc_gram_counts` frame
    led by ``id_col`` (same ``text_col``/``n`` as the model) — its
    ``(id, g)`` rows are already unique per that function's contract,
    so it is consumed by projection, no re-aggregation shuffle."""
    a = float(model.alpha)
    if grams is not None:
        dg = grams.select(id_col, "g", "k")
    else:
        dg = (
            _char_grams(df, text_col, model.n, [id_col])
            .groupBy(id_col, "g")
            .agg(F.count(F.lit(1)).alias("k"))
        )
    # grams outside the training vocabulary carry no signal — the
    # inner join drops them on both engines identically
    hits = dg.join(F.broadcast(model.counts), "g").select(
        id_col,
        "lang",
        (F.col("k") * F.log(F.col("c") + F.lit(a))).alias("w"),
        "k",
    )
    present = hits.groupBy(id_col, "lang").agg(
        F.sum("w").alias("ps"), F.sum("k").alias("np")
    )
    nd = (
        dg.join(
            F.broadcast(model.counts.select("g").distinct()), "g"
        )
        .groupBy(id_col)
        .agg(F.sum("k").alias("n_d"))
    )
    cand = nd.crossJoin(
        F.broadcast(model.klass.crossJoin(model.vocab))
    ).join(present, [id_col, "lang"], "left")
    score = (
        F.coalesce(F.col("ps"), F.lit(0.0))
        + (F.col("n_d") - F.coalesce(F.col("np"), F.lit(0)))
        * F.lit(math.log(a))
        - F.col("n_d") * F.log(F.col("tot") + F.lit(a) * F.col("v"))
        + F.col("lp_prior")
    )
    ranked = cand.select(
        id_col,
        "lang",
        "n_d",
        F.round(score / F.col("n_d"), 4).alias("nscore"),
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy(id_col).orderBy(
                F.desc("nscore"), F.asc("lang")
            )
        ),
    )
    return ranked.filter(F.col("rk") == 1).select(
        id_col,
        F.col("lang").alias("pred_lang"),
        F.col("n_d").cast("long").alias("n_grams"),
    )
