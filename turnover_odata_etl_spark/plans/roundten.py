"""Round-10 STAGED queries — held for a cap ruling (the r09 verdict
froze the registry at 201; precedent is the roundeight/roundnine
lifecycle: stage with oracles + bench history + empty-sweep coverage,
register when a verdict rules).

Two queries, each the only end-to-end oracle exercise of a real
capability added this round:

``s_snapshot_append_compact`` — the APPEND fast path + bin-pack
compaction lifecycle (``SnapshotTable.append``/``compact``, round 10):
insert-only waves, an at-least-once REPLAY of one wave (duplicate
rows by design), ``compact(dedup_keys=True)`` folding the replay,
``expire_snapshots`` reclaiming the replaced small files, and a final
aggregate read that must equal the plain batch answer. The unit tests
pin each mechanism; this pins the composed lifecycle against a DuckDB
oracle through the full stack.

``t_dsir_importance`` — DSIR-style importance reweighting (Xie et al.
2023, arXiv:2302.03169, "Data Selection for Language Models via
Importance Resampling"): fit unigram models of a TARGET distribution
(here: the ``lang='en'`` slice) and the RAW pool (the rest), score
every raw document by its length-normalized importance log-ratio
Σ count(w)·[ln p̂_tgt(w) − ln p̂_raw(w)] / n_tok with add-α smoothing
over the shared vocabulary, and select the top-k — the
domain-adaptation data-selection step of published pretraining
pipelines, next to quality filtering (E17/E78) and mixing (E73).

Activation checklist (mirror of roundnine's, executed at ruling):
1. move the two specs into ``@register`` form (oracles are already
   eager constants), import roundten in ``plans/__init__``,
2. add both to the gate window for their first round,
3. move STAGED_R10 → ADDITIONS_R10 in bench.py,
4. re-point the empty-sweep staged block (tests/test_empty_input.py),
5. adjudicate plan-audit entries if flagged (the DSIR model join is
   vocab-sized broadcast; the lifecycle query is three appends + one
   compact commit — protocol-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as TXT
from ..tables import load_table
from .registry import QuerySpec

APPEND_COMPACT_ORACLE = """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(1 AS BIGINT) AS max_files_per_bucket
    FROM events
    GROUP BY event_type
"""


def s_snapshot_append_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND → replay → dedup-COMPACT → GC lifecycle
    (``SnapshotTable.append``/``compact``, round 10) — the insert-only
    ingest pattern a fact/log table runs: four id-sliced waves append
    (O(batch) each, no base read-back), wave 2 REPLAYS verbatim
    (at-least-once delivery: duplicate rows land, by contract), then
    ``compact(dedup_keys=True)`` folds the table to keep-latest form
    one file per bucket and ``expire_snapshots`` reclaims every
    superseded small file. The final read must equal the plain batch
    aggregate — duplicates folded, nothing lost — and the emitted
    ``max_files_per_bucket`` constant (driver-side metadata from the
    per-bucket manifest view, not a data-path join) is 1 iff the
    bin-pack actually ran.

    Scale: each append is one staged write of its own wave; compaction
    reads only qualifying buckets and carries the rest by reference;
    GC is the explicitly retention-bounded op. The lifecycle cost is
    protocol, not data — the same adjudication as st_snapshot_ivm's
    per-trigger commits."""
    import os
    import shutil

    from ..storage import SnapshotTable

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    base = f"/tmp/spark_graft_layout/{tag}/append_compact"
    shutil.rmtree(base, ignore_errors=True)
    t = SnapshotTable(
        spark, os.path.join(base, "events"),
        key_cols=["event_id"], order_col="__ver", n_buckets=8,
    )
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    for w in (1, 2, 3, 4):
        t.append(
            ev.filter(F.col("event_id") % 4 == w - 1).withColumn(
                "__ver", F.lit(w)
            )
        )
    # At-least-once replay of wave 2: the SAME rows appended again —
    # merge-on-read contract says they land as duplicates ...
    t.append(
        ev.filter(F.col("event_id") % 4 == 1).withColumn("__ver", F.lit(2))
    )
    # ... and dedup compaction is the explicit fold (keys equal, rows
    # identical, so keep-latest keeps exactly the original row).
    t.compact(dedup_keys=True)
    t.expire_snapshots(keep_last=1)
    cur = t.current_id()
    max_files = max(
        (len(fs) for fs in t._by_bucket(cur).values()), default=0
    ) if cur is not None else 0
    return (
        t.read()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn(
            "max_files_per_bucket", F.lit(int(max_files)).cast("long")
        )
    )


# Importance weights are continuous (sums of ln-ratios, never on a
# decimal grid), so the 4dp rounding is boundary-safe for VALUES; the
# top-k ORDER uses the rounded score + doc_id tie-break so cross-engine
# sum-order ulps can never reorder the selection (same determinism
# device as t_weighted_sample_es' hash draw).
DSIR_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\s+')) AS tok
      FROM documents WHERE trim(text) <> ''
    ), cnt AS (
      SELECT tok,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS ct,
             CAST(sum(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS BIGINT)
               AS cr
      FROM toks GROUP BY tok
    ), tot AS (
      SELECT CAST(sum(ct) AS BIGINT) AS tt,
             CAST(sum(cr) AS BIGINT) AS tr,
             CAST(count(*) AS BIGINT) AS v
      FROM cnt
    ), lam AS (
      SELECT tok,
             ln((ct + 0.5) / (tt + 0.5 * v))
               - ln((cr + 0.5) / (tr + 0.5 * v)) AS lam
      FROM cnt CROSS JOIN tot
    ), scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tok,
             round(sum(lam) / count(*), 4) AS dsir_score
      FROM toks t JOIN lam USING (tok)
      WHERE t.lang <> 'en'
      GROUP BY t.doc_id
    ), ranked AS (
      SELECT doc_id, n_tok, dsir_score,
             row_number() OVER (ORDER BY dsir_score DESC, doc_id)
               AS sel_rank
      FROM scored
    )
    SELECT doc_id, n_tok, dsir_score, CAST(sel_rank AS BIGINT) AS sel_rank
    FROM ranked WHERE sel_rank <= 50
"""


def t_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance selection (Xie et al. 2023): score every RAW
    document by how much more likely its tokens are under the TARGET
    unigram model than the raw one — the cheap, provably-calibrated
    stand-in for training a classifier when you want 'more data that
    looks like X'. Target here is the ``lang='en'`` slice; the raw
    pool is everything else; add-0.5 smoothing over the shared
    vocabulary keeps unseen tokens finite on both sides. Emits the
    top-50 raw docs by length-normalized score (rounded to the 4dp
    grid BEFORE ranking, doc_id tie-break — cross-engine determinism).

    Plan shape: ONE corpus tokenize/explode feeds both model fits as a
    single conditional aggregation (vocab-sized output — Heaps' law,
    sublinear in corpus); the λ log-ratio table broadcasts into the
    scoring join, so the corpus never shuffles on token; the top-50 is
    a distributed TakeOrdered (sort+limit — no global single-partition
    window), re-ranked post-limit on 50 rows. At 100 TB: two
    broadcast-sized models, one map-side explode, one doc-grain
    aggregate, one top-k."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("tk", TXT.tokens(F.col("text")))
        .filter(F.size("tk") >= 1)
    )
    toks = docs.select("doc_id", "lang", F.explode("tk").alias("tok"))
    is_tgt = (F.col("lang") == "en").cast("long")
    cnt = toks.groupBy("tok").agg(
        F.sum(is_tgt).alias("ct"),
        F.sum(1 - is_tgt).alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("long").alias("tt"),
        F.sum("cr").cast("long").alias("tr"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lam = cnt.join(F.broadcast(tot)).select(
        "tok",
        (
            F.log((F.col("ct") + 0.5) / (F.col("tt") + 0.5 * F.col("v")))
            - F.log((F.col("cr") + 0.5) / (F.col("tr") + 0.5 * F.col("v")))
        ).alias("lam"),
    )
    scored = (
        toks.filter(F.col("lang") != "en")
        .join(F.broadcast(lam), "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tok"),
            F.round(
                F.sum("lam") / F.count(F.lit(1)), 4
            ).alias("dsir_score"),
        )
    )
    top = scored.orderBy(
        F.desc("dsir_score"), F.asc("doc_id")
    ).limit(50)
    return top.select(
        "doc_id",
        "n_tok",
        "dsir_score",
        F.row_number()
        .over(Window.orderBy(F.desc("dsir_score"), F.asc("doc_id")))
        .cast("long")
        .alias("sel_rank"),
    )


# Staged specs — same shape the registry holds, NOT registered (cap).
STAGED: dict[str, QuerySpec] = {
    "s_snapshot_append_compact": QuerySpec(
        name="s_snapshot_append_compact",
        fn=s_snapshot_append_compact,
        oracle=APPEND_COMPACT_ORACLE,
        tags=("storage", "snapshot", "append", "compact"),
    ),
    "t_dsir_importance": QuerySpec(
        name="t_dsir_importance",
        fn=t_dsir_importance,
        oracle=DSIR_ORACLE,
        tags=("llm", "sampling", "importance"),
    ),
}
