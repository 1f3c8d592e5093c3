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
