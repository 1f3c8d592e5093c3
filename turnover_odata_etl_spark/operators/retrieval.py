"""Corpus-scale lexical retrieval — BM25 inverted-index top-k
(round 12, VERDICT r11 item 4 / SURVEY E111).

The retrieval rung the curation ladder lacked: decontamination (E65)
and TF-IDF (E10) already build document-frequency tables, but nothing
answered "given a query, which documents rank highest?" — the shape
behind dataset search, RAG candidate generation, and the
training-data attribution audits ("which corpus docs most resemble
this benchmark item?") that pair with E65's n-gram decontamination.

Model — Okapi BM25 in Lucene's nonnegative-idf form:

    idf(t)      = ln(1 + (N − df_t + 0.5) / (df_t + 0.5))
    score(q, d) = Σ_{t ∈ q}  idf(t) ·
                  tf_td / (tf_td + k1·(1 − b + b·dl_d / avgdl))

with tf_td the term's count in d, dl_d the document token length,
N / avgdl over documents that tokenize to ≥ 1 term, and query terms
treated as a SET (the standard bag-of-words query contract; weighted
queries are a caller-side repeat of the (query_id, term) row).

Scale shape (the inverted-index discipline, reference IR systems
build offline what this declares as one plan):

- the corpus is exploded and aggregated ONCE at (doc, term) grain —
  the postings table — and once more at doc grain for lengths; both
  are map-side-combined single shuffles, the same two passes every
  index build pays;
- the query set broadcasts INTO the postings scan (an equi-join on
  term), so only the query terms' postings survive — per-query work
  is O(Σ posting lists), never O(corpus); df for those terms is
  derived from the restricted postings (K-sized) and broadcast back;
- document lengths join the RESTRICTED candidates on doc_id — the
  candidate side of that exchange is candidate-sized, the dl side is
  one row per corpus document (doc-grain, the honest cost of exact
  length normalization; a scale deployment amortizes it by
  materializing dl once per corpus version, not per query batch);
  the corpus-stats frame is 1 row;
- top-k is a per-query window over each query's own candidate set —
  bounded by its posting lists, no global sort.

Every arithmetic step is closed-form, so a SQL oracle replays the
whole model exactly; ranking compares 4dp-rounded scores with doc-id
tie-break (the cross-engine determinism device every scored query
here uses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TXT


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    doc_id: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` carries one row per (query_id, term) — already
    tokenized, distinct rows (set semantics). Returns
    ``(query_id, doc_id, score, rn)`` with ``score`` rounded to the
    4dp grid and ``rn`` the 1-based rank (score desc, doc_id asc).
    Documents sharing no term with a query simply don't appear; a
    query whose terms miss the corpus entirely yields no rows."""
    tok = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.explode(TXT.tokens(text_col)).alias("term"),
    )
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.avg("dl").alias("avgdl"),
    )  # 1 row — broadcasts
    q = queries.select(
        F.col("query_id").cast("long").alias("query_id"), "term"
    )
    # query-term postings only: the broadcast equi-join IS the
    # inverted-index lookup — everything downstream is candidate-sized
    tfq = tf.join(F.broadcast(q), "term")
    dfq = (
        tfq.select("term", "doc_id")
        .distinct()
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("df"))
    )
    part = (
        tfq.join(F.broadcast(dfq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
    )
    return _rank_scored(part, k, k1, b)


def _rank_scored(part: DataFrame, k: int, k1: float, b: float) -> DataFrame:
    """Shared BM25 scoring + ranking tail (batch :func:`bm25_topk`
    and the incremental :class:`BM25Index` build the same
    ``(query_id, doc_id, tf, df, dl, n, avgdl)`` candidate frame, so
    convergence of the two paths is arithmetic identity, not luck).
    Per-(query, doc) scores sum on the 4dp grid; ranking ties break
    on doc_id."""
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    w_td = F.col("tf") / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = part.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(idf * w_td), 4).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "doc_id",
            "score",
            F.col("rn").cast("long").alias("rn"),
        )
    )


class BM25Index:
    """PERSISTENT incremental BM25 index (round 12, SURVEY E113) —
    the retrieval sibling of the incremental LSH / SemDeDup / IVF
    indexes, with one property they don't have: nothing here is
    approximate, so the union of waves converges EXACTLY to
    :func:`bm25_topk` over the accumulated corpus and the batch
    oracle applies verbatim (the d_incremental_neardup convergence
    device, without even an epsilon).

    Layout: ``postings`` keyed (term, doc_id), PHYSICALLY BUCKETED on
    term — a search probes terms, so :meth:`SnapshotTable.read_matching`
    opens only the query terms' buckets; ``doclen`` keyed doc_id for
    the length-normalization join. Both tables commit per wave as ONE
    :class:`SnapshotGroup` transaction (postings can never run ahead
    of lengths), and the corpus stats (N, Σdl — the exact integers
    behind idf and avgdl) ride that same commit as ADDITIVE manifest
    properties: search reads them O(1) from the latest commit instead
    of re-aggregating the corpus.

    Wave contract (the NeardupIndex discipline): waves carry NEW
    documents only, consecutive ``ver``; a same-``ver`` replay is
    detected via :meth:`current_wave` and skips the append (no
    duplicate postings can land), wave-number gaps refuse loudly."""

    def __init__(self, spark, base_dir: str, n_buckets: int = 16):
        import os

        from ..storage import SnapshotGroup, SnapshotTable

        self.spark = spark
        self.postings = SnapshotTable(
            spark, os.path.join(base_dir, "postings"),
            key_cols=["term", "doc_id"], order_col="__ver",
            n_buckets=n_buckets, bucket_cols=["term"],
        )
        self.doclen = SnapshotTable(
            spark, os.path.join(base_dir, "doclen"),
            key_cols=["doc_id"], order_col="__ver",
            n_buckets=n_buckets,
        )
        self.group = SnapshotGroup(
            {"postings": self.postings, "doclen": self.doclen},
            base_dir,
        )

    def current_wave(self) -> int:
        """Last fully-committed wave (0 = none). Runs the group's
        recover() first so a crash inside the roll-forward window is
        healed, never read as a torn commit."""
        self.group.recover()
        return int(self.postings.latest_property("bm25.wave") or 0)

    def stats(self) -> tuple[int, int]:
        """(n_docs, total_len) — exact integer accumulators from the
        latest commit's properties; (0, 0) before the first wave."""
        self.group.recover()
        n = self.postings.latest_property("bm25.n_docs")
        tl = self.postings.latest_property("bm25.total_len")
        return int(n or 0), int(tl or 0)

    def wave(
        self,
        docs: DataFrame,
        ver: int,
        doc_id: str = "doc_id",
        text_col: str = "text",
    ) -> None:
        """Index one wave of NEW documents: O(batch) tokenize +
        aggregate, ONE atomic two-table append, stats accumulated as
        properties. Only the 1-row batch-stat frame touches the
        driver."""
        done = self.current_wave()
        if done >= ver:
            return  # replayed wave — already committed, idempotent
        if done != ver - 1:
            raise ValueError(
                f"BM25Index: wave {ver} cannot commit over checkpoint "
                f"{done} — waves are consecutive (replay the same ver,"
                " or the next)"
            )
        from pyspark import StorageLevel

        tok = docs.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(TXT.tokens(text_col)).alias("term"),
        )
        # persisted: tf feeds dl AND the postings append; dl feeds
        # the stats job AND the doclen append — without the pins each
        # consumer re-runs the tokenize/explode/aggregate pipeline
        # (review r12: the wave really is ONE O(batch) pass)
        tf = (
            tok.groupBy("doc_id", "term")
            .agg(F.count(F.lit(1)).alias("tf"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            dl = (
                tf.groupBy("doc_id")
                .agg(F.sum("tf").alias("dl"))
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                row = dl.agg(
                    F.count(F.lit(1)).alias("nd"),
                    F.coalesce(F.sum("dl"), F.lit(0)).alias("tl"),
                ).first()  # 1 row — metadata, never data
                n0, tl0 = self.stats()
                self.group.append_all(
                    {
                        "postings": tf.withColumn("__ver", F.lit(ver)),
                        "doclen": dl.withColumn("__ver", F.lit(ver)),
                    },
                    properties={
                        "bm25.wave": ver,
                        "bm25.n_docs": n0 + int(row["nd"]),
                        "bm25.total_len": tl0 + int(row["tl"]),
                    },
                )
            finally:
                dl.unpersist()
        finally:
            tf.unpersist()

    def topk(
        self,
        queries: DataFrame,
        k: int = 10,
        k1: float = 1.2,
        b: float = 0.75,
    ) -> DataFrame:
        """Top-``k`` docs per query over everything indexed so far —
        same contract as :func:`bm25_topk`. The postings read opens
        only the query terms' physical buckets (``read_matching``;
        co-hashed terms' rows are discarded by the term equi-join);
        df comes from those pruned postings (exact — a term's whole
        posting list lives in its bucket), N/avgdl from the O(1)
        property accumulators; the doclen join reads only the
        candidate docs' buckets."""
        n_docs, total_len = self.stats()
        if n_docs == 0:
            return self.spark.createDataFrame(
                [], "query_id long, doc_id long, score double, rn long"
            )
        q = queries.select(
            F.col("query_id").cast("long").alias("query_id"), "term"
        )
        pruned = self.postings.read_matching(q.select("term"))
        # persisted ONLY across the two metadata actions below (the
        # wave() try/finally discipline, ADVICE r12 + review r13):
        # df-per-term collapses to a ≤|query-terms|-row LOCAL frame
        # (exact — a term's whole posting list lives in its bucket),
        # and the doclen bucket probe collects ≤ n_buckets ids. The
        # returned plan is LAZY and fully distributed (no driver
        # materialization of the ranking — a 1M-query batch scorer
        # never routes results through the driver); its single tfq
        # recompute in the final job is one pass over the pruned
        # posting lists.
        from pyspark import StorageLevel

        tfq = (
            pruned.select("term", "doc_id", "tf")
            .join(F.broadcast(q), "term")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        try:
            df_rows = (
                tfq.select("term", "doc_id")
                .distinct()
                .groupBy("term")
                .agg(F.count(F.lit(1)).cast("long").alias("df"))
                .collect()  # ≤ |query terms| rows — metadata
            )
            dl = self.doclen.read_matching(
                tfq.select("doc_id")  # eager ≤ n_buckets-id collect
            ).select("doc_id", "dl")
        finally:
            tfq.unpersist()
        if not df_rows:
            return self.spark.createDataFrame(
                [], "query_id long, doc_id long, score double, rn long"
            )
        dfq = self.spark.createDataFrame(
            [(r["term"], r["df"]) for r in df_rows],
            "term string, df long",
        )
        # exact integers divided in IEEE double — bit-identical to
        # the batch path's avg(dl) over the same corpus
        part = (
            tfq.join(F.broadcast(dfq), "term")
            .join(dl, "doc_id")
            .withColumn("n", F.lit(float(n_docs)))
            .withColumn("avgdl", F.lit(total_len / n_docs))
        )
        return _rank_scored(part, k, k1, b)
