"""Similarity search over embedding columns (SURVEY §2.12 E9).

Two tiers:

- ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
  query set against the corpus, cosine via ``zip_with``/``aggregate``
  (JVM-side, no UDF), per-query top-k via window. Cost O(|Q|·|corpus|)
  but embarrassingly parallel and map-only until the tiny top-k
  shuffle — the right baseline, and still the right answer when |Q|
  is small even at a 100 TB corpus.

- ``srp_lsh_topk`` — sign-random-projection LSH: deterministic
  md5-derived hyperplanes bucket vectors by sign-bit signature;
  queries only compare against same-bucket vectors (multi-table OR
  for recall), then exact re-rank. Sub-linear per query; recall < 1
  by construction (tests assert a floor against brute force).
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine
from ..tables import ensure_parallelism

# Driver-small contract ceiling for operators that materialize the
# query set on the driver (cosine_topk_blocked, pq_topk). At the
# default 8192 the shipped state stays metadata-scale (query matrix
# 8192×64 f64 ≈ 4 MB; PQ ADC LUT 8192×8×16 f64 ≈ 8 MB); anything
# larger auto-dispatches to the fully distributed tiled cogroup path.
DRIVER_SMALL_MAX_QUERIES = 8192


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.
    Output: (query_id, neighbor_id, cos, rn)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _empty_topk(df: DataFrame) -> DataFrame:
    """Schema-stable empty result shared by the whole top-k family —
    the C3 contract on zero-row inputs (the empty-input sweep in
    ``tests/test_empty_input.py`` exercises every path): a driver-side
    probe or centroid/codebook seed that collects nothing must yield
    an empty frame, never feed a (0,)-shaped matrix to numpy."""
    return df.sparkSession.createDataFrame(
        [], "query_id long, neighbor_id long, cos double, rn long"
    )


def _hyperplane(table: int, plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane: each component
    derived from md5(table, plane, i) → [-0.5, 0.5). No RNG state."""
    comps = []
    for i in range(dim):
        h = hashlib.md5(f"srp:{table}:{plane}:{i}".encode()).digest()
        comps.append(int.from_bytes(h[:4], "big") / 2**32 - 0.5)
    return comps


def srp_signature(vec_col, table: int, planes: int, dim: int):
    """Sign-bit signature of ``vec_col`` against ``planes`` fixed
    hyperplanes → integer bucket id. Pure column expression."""
    sig = F.lit(0).cast("long")
    for p in range(planes):
        hp = F.array(*[F.lit(c) for c in _hyperplane(table, p, dim)])
        dot = F.aggregate(
            F.zip_with(vec_col.cast("array<double>"), hp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return sig


def cosine_topk_blocked(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    max_driver_queries: int = DRIVER_SMALL_MAX_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors, scale-shaped: the query matrix
    (driver-small contract, ENFORCED below) is shipped into a map-only
    ``mapInPandas`` pass; each Arrow batch scores corpus×queries as one
    numpy GEMM and emits only its batch-local top-(k+5) per query.
    Global top-k ⊆ union of batch-local top-k, so correctness is
    preserved; the +5 margin covers GEMM-vs-fold ulp reordering at the
    k boundary. Candidates are re-scored with the fold-order JVM
    ``cosine`` so emitted values match the SQL oracle bit-for-bit.

    Wire cost: |corpus|·(k+5)/batch candidates instead of
    |corpus|·|queries| scored rows through the window.

    The driver-small contract is enforced by code, not docstring: the
    query collect probes ``max_driver_queries + 1`` rows, and a larger
    query set dispatches to the fully-distributed ``cosine_topk_tiled``
    cogroup path (identical output contract — both are exact with
    (cos desc, neighbor_id) tie ordering), so nothing corpus-sized can
    ever materialize on the driver."""
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
        )
        .limit(max_driver_queries + 1)
        .collect()
    )
    if len(q_rows) > max_driver_queries:
        return cosine_topk_tiled(queries, corpus, id_col, vec_col, k=k)
    if not q_rows:
        return _empty_topk(queries)
    qids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    Q = np.array([r.vec for r in q_rows], dtype=np.float64)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    take = k + 5

    def score(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            Vn = V / _np.linalg.norm(V, axis=1, keepdims=True)
            C = Qn @ Vn.T  # (n_queries, batch)
            nids = pdf["nid"].to_numpy()
            C[qids[:, None] == nids[None, :]] = -_np.inf  # drop self-pairs
            t = min(take, C.shape[1])
            # deterministic (cos desc, neighbor_id asc) prefix — see
            # the tiled tile() note on exact-tie survival
            nid_grid = _np.broadcast_to(nids[None, :], C.shape)
            idx = _np.lexsort((nid_grid, -C), axis=1)[:, :t]
            out_q = _np.repeat(qids, t)
            out_n = nids[idx.reshape(-1)]
            yield _pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    # The GEMM is CPU-bound per corpus partition; a single-file fixture
    # scan arrives as one partition and would serialize it on one core.
    # ensure_parallelism fans it out and is a no-op at real scale.
    cands = ensure_parallelism(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vec"))
    ).mapInPandas(score, "query_id long, neighbor_id long")

    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def cosine_topk_tiled(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    q_blocks: int = 8,
    c_blocks: int = 8,
) -> DataFrame:
    """Exact top-k cosine neighbors with the QUERY SIDE distributed —
    the large-|Q| complement to ``cosine_topk_blocked`` (which collects
    the query matrix to the driver under a documented driver-small
    contract).

    Distributed block matrix multiply: queries hash into ``q_blocks``
    row-blocks, corpus into ``c_blocks``; every (qb, cb) tile is one
    cogrouped task that scores its (|Q|/q_blocks)×(|C|/c_blocks) slab
    as a single numpy GEMM and emits only per-query tile-local
    top-(k+5) candidates. Global top-k ⊆ union of tile top-k per query
    row, so no neighbor can be lost; the +5 margin absorbs GEMM-vs-fold
    ulp reordering at the k boundary, and candidates are re-scored with
    the fold-order JVM ``cosine`` so emitted values match the SQL
    oracle bit-for-bit.

    Shuffle cost: queries replicated ×c_blocks + corpus replicated
    ×q_blocks (standard 2D block matmul); candidate traffic is
    |Q|·c_blocks·(k+5), never |Q|·|C|. Nothing touches the driver —
    at 100 TB pick block counts so each slab's GEMM fits an executor
    (rows/block ≈ sqrt(task_mem / 8·dim))."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("vec")
    ).withColumn("qb", F.pmod("qid", F.lit(q_blocks)).cast("int"))
    c = corpus.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("vec")
    ).withColumn("cb", F.pmod("nid", F.lit(c_blocks)).cast("int"))

    left = q.withColumn(
        "cb", F.explode(F.array(*[F.lit(i) for i in range(c_blocks)]))
    ).select("qb", "cb", "qid", "vec")
    right = c.withColumn(
        "qb", F.explode(F.array(*[F.lit(i) for i in range(q_blocks)]))
    ).select("qb", "cb", "nid", "vec")
    take = k + 5

    def tile(key, qpdf, cpdf):
        import numpy as _np
        import pandas as _pd

        if len(qpdf) == 0 or len(cpdf) == 0:
            return _pd.DataFrame({"query_id": [], "neighbor_id": []}).astype(
                "int64"
            )
        Q = _np.array(qpdf["vec"].tolist(), dtype=_np.float64)
        V = _np.array(cpdf["vec"].tolist(), dtype=_np.float64)
        Qn = Q / _np.linalg.norm(Q, axis=1, keepdims=True)
        Vn = V / _np.linalg.norm(V, axis=1, keepdims=True)
        C = Qn @ Vn.T
        qids = qpdf["qid"].to_numpy()
        nids = cpdf["nid"].to_numpy()
        C[qids[:, None] == nids[None, :]] = -_np.inf  # drop self-pairs
        t = min(take, C.shape[1])
        # lexsort, not argpartition: if > t candidates tie exactly in
        # cosine (duplicated embeddings), the surviving set must be the
        # deterministic (cos desc, neighbor_id asc) prefix or the final
        # top-k can diverge from the oracle's tie ordering.
        nid_grid = _np.broadcast_to(nids[None, :], C.shape)
        idx = _np.lexsort((nid_grid, -C), axis=1)[:, :t]
        return _pd.DataFrame(
            {
                "query_id": _np.repeat(qids, t),
                "neighbor_id": nids[idx.reshape(-1)],
            }
        )

    cands = (
        left.groupby("qb", "cb")
        .cogroup(right.groupby("qb", "cb"))
        .applyInPandas(tile, "query_id long, neighbor_id long")
    )

    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cands.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def srp_bucket_vectors(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    out_id: str,
    dim: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """(out_id, vec, buckets array<long>) — one SRP bucket per table,
    computed vectorized over Arrow batches (one numpy GEMM against the
    fixed hyperplane matrix per batch) instead of per-element
    interpreted column lambdas. Same md5-derived hyperplanes as
    ``srp_signature``; map-only, so it scales with partition count."""
    # (tables*planes, dim) hyperplane matrix, built once on the driver
    # (tiny) and shipped inside the closure by value.
    R = np.array(
        [
            _hyperplane(t, p, dim)
            for t in range(tables)
            for p in range(planes)
        ],
        dtype=np.float64,
    )
    n_tables, n_planes = tables, planes

    def compute(batches):
        import numpy as _np
        import pandas as _pd

        weights = 1 << _np.arange(n_planes, dtype=_np.int64)
        for pdf in batches:
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            bits = (V @ R.T > 0).reshape(len(V), n_tables, n_planes)
            buckets = (bits * weights).sum(axis=2).astype(_np.int64)
            yield _pd.DataFrame(
                {
                    "out_id": pdf["out_id"],
                    "vec": pdf["vec"],
                    "buckets": list(buckets),
                }
            )

    return (
        ensure_parallelism(
            df.select(F.col(id_col).alias("out_id"), F.col(vec_col).alias("vec"))
        )
        .mapInPandas(compute, "out_id long, vec array<float>, buckets array<bigint>")
        .withColumnRenamed("out_id", out_id)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.45,
    blocks: int = 8,
) -> DataFrame:
    """EXACT all-pairs embedding near-dup: every (a_id, b_id, cos) with
    cosine ≥ threshold and a_id < b_id.

    Scale shape — distributed block matrix multiply: vectors are
    assigned to ``blocks`` row-blocks by id; each of the
    blocks·(blocks+1)/2 block *pairs* becomes one cogrouped task that
    computes its similarity tile as a single numpy GEMM and emits only
    the tile's over-threshold candidates. Work per task is
    (n/blocks)², total O(n²/blocks) rows in flight per task — raise
    ``blocks`` as n² grows; for web-scale corpora switch to the LSH
    path (``srp_bucket_vectors``) and accept approximate recall.

    Candidates are re-scored with the JVM left-fold ``cosine`` before
    the final threshold so output values are bit-identical to the SQL
    oracle's fold arithmetic (GEMM's pairwise summation can differ in
    the last ulp; the margin re-check removes that risk)."""
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    base = v.withColumn("blk", F.pmod("vid", F.lit(blocks)).cast("int"))
    blk_ids = F.array(*[F.lit(i) for i in range(blocks)])
    left = (
        base.withColumn("j", F.explode(blk_ids))
        .filter(F.col("j") >= F.col("blk"))
        .select(F.col("blk").alias("bi"), F.col("j").alias("bj"), "vid", "vec")
    )
    right = (
        base.withColumn("i", F.explode(blk_ids))
        .filter(F.col("i") <= F.col("blk"))
        .select(F.col("i").alias("bi"), F.col("blk").alias("bj"), "vid", "vec")
    )
    margin = threshold - 1e-6

    def tile(key, lpdf, rpdf):
        import numpy as _np
        import pandas as _pd

        bi, bj = key
        if len(lpdf) == 0 or len(rpdf) == 0:
            return _pd.DataFrame({"a_id": [], "b_id": []}).astype("int64")
        L = _np.array(lpdf["vec"].tolist(), dtype=_np.float64)
        R_ = _np.array(rpdf["vec"].tolist(), dtype=_np.float64)
        L = L / _np.linalg.norm(L, axis=1, keepdims=True)
        R_ = R_ / _np.linalg.norm(R_, axis=1, keepdims=True)
        C = L @ R_.T
        li = lpdf["vid"].to_numpy()
        ri = rpdf["vid"].to_numpy()
        ai, bi_ = _np.nonzero(C >= margin)
        a, b = li[ai], ri[bi_]
        if bi == bj:
            # diagonal tile holds both orders + self-pairs: strict <
            keep = a < b
            a, b = a[keep], b[keep]
        else:
            # off-diagonal tile holds each cross pair once, but block
            # membership (vid % blocks) doesn't order ids — orient
            keep = a != b
            a, b = a[keep], b[keep]
            a, b = _np.minimum(a, b), _np.maximum(a, b)
        return _pd.DataFrame({"a_id": a, "b_id": b})

    cands = (
        left.groupby("bi", "bj")
        .cogroup(right.groupby("bi", "bj"))
        .applyInPandas(tile, "a_id long, b_id long")
    )
    a = v.select(F.col("vid").alias("a_id"), F.col("vec").alias("a_vec"))
    b = v.select(F.col("vid").alias("b_id"), F.col("vec").alias("b_vec"))
    return (
        cands.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("cos", cosine("a_vec", "b_vec"))
        .filter(F.col("cos") >= threshold)
        .select("a_id", "b_id", F.round("cos", 4).alias("cos"))
    )



def _safe_norm(m: np.ndarray) -> np.ndarray:
    """Row norms with zeros mapped to 1 — a zero seed/mean vector must
    not poison the centroid matrix with NaN (argmax over a NaN column
    would absorb every assignment)."""
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return np.where(n == 0.0, 1.0, n)


def kmeans_assign(
    vectors: DataFrame, n_cells: int
) -> "tuple[DataFrame | None, np.ndarray | None]":
    """Deterministic seeded k-means cell assignment — the shared
    clustering kernel under :func:`ivf_topk` (IVF coarse quantizer)
    and :func:`..dedup.semantic_dedup` (SemDeDup cluster stage).

    ``vectors`` must carry ``(nid, vec array<float>)`` — ``nid`` may
    be long OR string (round 11: the id passes through with its own
    type; see :func:`assign_to_centroids`). Centroids:
    first ``n_cells`` vectors by id (deterministic seeding, no RNG) +
    ONE distributed Lloyd refinement (assign → per-cell mean via a
    (cell, dim) aggregation). Only the centroid matrix itself touches
    the driver — n_cells·dim floats, metadata-sized at any corpus
    scale; assignment is a per-partition GEMM over Arrow batches
    (map-only, no shuffle). Returns ``(assigned, centroids)`` where
    ``assigned`` adds a ``cell`` column, or ``(None, None)`` on empty
    input."""
    c = ensure_parallelism(vectors)

    seed_rows = (
        c.orderBy("nid").limit(n_cells).select("vec").collect()
    )  # n_cells vectors — metadata-scale collect, not the data path
    if not seed_rows:
        return None, None
    cents = np.array([r.vec for r in seed_rows], dtype=np.float64)
    cents = cents / _safe_norm(cents)

    assigned0 = assign_to_centroids(c, cents)
    # One Lloyd iteration: per-cell mean, computed distributed as a
    # (cell, dim) aggregation; only the n_cells×dim result is
    # collected. Round-16 audit: this shape is ALREADY shuffle-
    # minimal — the explode is map-side CPU and the hash aggregate
    # partial-combines to (cell, dim) grain BEFORE its exchange, so
    # only n_cells×dim partial states per map partition cross the
    # wire at any corpus scale. A dim-wide `avg(vec[i])` single-pass
    # variant was built and interleaved-A/B'd (s_knn_ivf 2.41 vs
    # 2.06 s, d_semdedup_incremental 7.81 vs 7.56 s at sf0.1): the
    # 65-buffer aggregate's codegen cost exceeds the explode it
    # removes — rejected, posexplode kept.
    means = (
        assigned0.select("cell", F.posexplode("vec").alias("dim", "x"))
        .groupBy("cell", "dim")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    cents2 = cents.copy()
    for r in means:
        cents2[r.cell][r.dim] = r.m
    cents2 = cents2 / _safe_norm(cents2)

    assigned = assign_to_centroids(c, cents2)
    return assigned, cents2


def assign_to_centroids(
    vectors: DataFrame, cents, carry: tuple = ()
) -> DataFrame:
    """Assign ``(nid, vec)`` rows to their nearest centroid by cosine
    — the map-only GEMM kernel of :func:`kmeans_assign`, exposed for
    FIXED-centroid consumers (IVF probes, incremental SemDeDup waves
    assigning arrivals against a frozen wave-1 codebook). ``cents``
    is the row-normalized numpy matrix kmeans_assign returns; only it
    ships to executors (n_cells·dim floats — metadata-sized), the
    assignment itself is a per-Arrow-batch matmul with no shuffle.

    ``nid`` passes through with its OWN type (long ids and string keys
    both work — the Arrow schema is derived from the input, ADVICE
    r09/VERDICT r10: string-keyed corpora are the common case in
    web-crawl curation). ``carry`` names extra input columns to pass
    through untouched (round 13 — :func:`ivf_refresh` carries the
    snapshot order column through the reassignment)."""
    nid_t = vectors.schema["nid"].dataType.simpleString()
    carry = tuple(carry)
    carry_t = {
        c: vectors.schema[c].dataType.simpleString() for c in carry
    }

    def assign(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            nrm = _np.linalg.norm(V, axis=1, keepdims=True)
            Vn = V / _np.where(nrm == 0.0, 1.0, nrm)
            cell = (Vn @ cents.T).argmax(axis=1).astype(_np.int64)
            data = {"nid": pdf["nid"], "vec": pdf["vec"], "cell": cell}
            for c in carry:
                data[c] = pdf[c]
            yield _pd.DataFrame(data)

    schema = f"nid {nid_t}, vec array<float>, cell long" + "".join(
        f", {c} {carry_t[c]}" for c in carry
    )
    return vectors.mapInPandas(assign, schema)


def ivf_probe_cells(
    queries: DataFrame, cents, nprobe: int
) -> DataFrame:
    """(query_id, q_vec, cell): each query's ``nprobe`` nearest
    centroid cells — the IVF probe kernel, extracted from
    :func:`ivf_topk` (round 12) for FIXED-codebook consumers (the
    persistent IVF index searches a frozen wave-1 codebook). A
    map-only GEMM per Arrow batch; only the centroid matrix ships.

    ``nprobe`` clamps to the codebook size (review r12: a tiny corpus
    seeds fewer centroids than nprobe, and argsort's silent cap then
    disagreed with the repeat count — a pandas length crash); a
    zero-norm query keeps its raw dot products (all zero — cells in
    positional order) instead of poisoning the GEMM row with NaN,
    the same guard its sibling :func:`assign_to_centroids` uses."""

    def probe(batches):
        import numpy as _np
        import pandas as _pd

        p = min(int(nprobe), int(cents.shape[0]))
        for pdf in batches:
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            nrm = _np.linalg.norm(V, axis=1, keepdims=True)
            Vn = V / _np.where(nrm == 0.0, 1.0, nrm)
            order = _np.argsort(-(Vn @ cents.T), axis=1)[:, :p]
            yield _pd.DataFrame(
                {
                    "query_id": pdf["query_id"]
                    .repeat(p)
                    .reset_index(drop=True),
                    "q_vec": pdf["vec"]
                    .repeat(p)
                    .reset_index(drop=True),
                    "cell": order.reshape(-1).astype(_np.int64),
                }
            )

    return queries.select("query_id", "vec").mapInPandas(
        probe, "query_id long, q_vec array<float>, cell long"
    )


def topk_from_cells(
    q_probes: DataFrame, cells: DataFrame, k: int
) -> DataFrame:
    """Exact re-rank of per-cell candidates: join the probe frame to
    a ``(cell, nid, vec)`` candidate source on the cell key, cosine,
    top-``k`` per query (score desc, neighbor asc — deterministic).
    Shared tail of :func:`ivf_topk` and the persistent-index search;
    extra rows from co-hashed cells in a bucket-pruned source are
    discarded by the cell equi-join, never wrong output."""
    cands = (
        q_probes.join(
            cells.select(
                "cell",
                F.col("nid").alias("neighbor_id"),
                F.col("vec").alias("c_vec"),
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), "neighbor_id"
    )
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    ``n_cells`` Voronoi cells around centroids, probe only the
    ``nprobe`` nearest cells per query, exact-re-rank the candidates.

    Clustering is :func:`kmeans_assign` (deterministic seed + one
    Lloyd step). Per-query candidate work is ~nprobe/n_cells of the
    corpus; recall rises with nprobe (nprobe = n_cells ⇒ exact)."""
    assigned, cents2 = kmeans_assign(
        corpus.select(
            F.col(id_col).alias("nid"), F.col(vec_col).alias("vec")
        ),
        n_cells,
    )
    if assigned is None:
        return _empty_topk(corpus)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
    )
    q_probes = ivf_probe_cells(q, cents2, nprobe)
    return topk_from_cells(q_probes, assigned, k)


def ivf_refresh(
    index,
    n_cells: int = 16,
    sample_fraction: float = 1.0,
    seed: int = 13,
):
    """IVF index MAINTENANCE (round 13 — VERDICT r12 item 5): the
    frozen wave-1 codebook measurably costs recall as the corpus
    drifts from the first wave (75/70/92% vs whole-corpus k-means,
    SCALE.md round 12); production IVF periodically re-trains the
    codebook over the accumulated postings and rebalances — the
    ``compact()``-shaped maintenance commit (public reference:
    FAISS/Milvus index retraining, Delta OPTIMIZE discipline).

    One pass: read the cell-bucketed postings table, re-train the
    k-means codebook over all accumulated vectors (or a
    ``sample_fraction`` at very large corpora — the fit-on-a-sample
    deployment shape), reassign every posting to its new nearest
    cell (map-only GEMM; the order column rides the ``carry``
    passthrough), and :meth:`~..storage.SnapshotTable.overwrite` the
    table in ONE commit — keys and buckets both move, which is why
    the row-preserving rewrite verbs can't carry this. Probe reads
    against the new codebook resume immediately; time travel keeps
    the pre-refresh index readable.

    Returns the retrained row-normalized centroid matrix (the new
    codebook the caller searches with), or ``None`` on an empty
    index (no commit). O(table) by design — this IS the rebuild; per
    wave the index stays O(batch) append-only, and the refresh runs
    at maintenance cadence."""
    cents, reassigned = _retrain_reassign(
        index, n_cells, sample_fraction, seed
    )
    if cents is None:
        return None
    index.overwrite(
        reassigned,
        operation="ivf-refresh",
        properties={"ivf.refresh.cells": str(int(cents.shape[0]))},
    )
    return cents


def _retrain_reassign(index, n_cells, sample_fraction, seed):
    """Shared retrain half of :func:`ivf_refresh` and
    :meth:`IvfIndex.refresh` (review r13 — one place for the
    read → sample → k-means → carry-reassign pipeline): returns
    ``(cents, reassigned_frame)`` or ``(None, None)`` on an empty
    index."""
    rows = index.read()
    train = rows.select("nid", "vec")
    if sample_fraction < 1.0:
        train = train.sample(fraction=sample_fraction, seed=seed)
    _, cents = kmeans_assign(train, n_cells)
    if cents is None:
        return None, None
    order = index.order_col
    reassigned = assign_to_centroids(
        rows.select("nid", "vec", order), cents, carry=(order,)
    ).select("cell", "nid", "vec", order)
    return cents, reassigned


class IvfIndex:
    """PERSISTENT IVF ANN index with a DURABLE codebook (round 13 —
    the serving-shaped completion of E112/E119): two snapshot tables
    under one :class:`..storage.SnapshotGroup` —

    - ``postings`` keyed (cell, nid), PHYSICALLY BUCKETED on cell
      (a search probes cells, so ``read_matching`` opens only the
      probed cells' buckets);
    - ``codebook`` keyed cell — the centroid matrix itself, durable
      and versioned WITH the postings it indexes.

    The consistency invariant the group carries: postings are only
    meaningful against the codebook that assigned them, so wave 1
    commits its fitted codebook atomically with its postings, and
    :meth:`refresh` (re-train + rebalance) lands the new codebook and
    the reassigned postings in ONE mixed-verb transaction
    (``apply_all`` — a probe can never read new centroids over the
    old cell layout or vice versa). Search needs no session state at
    all: a fresh process opens the index and serves.

    Wave contract (the NeardupIndex discipline): waves carry NEW
    vectors only, consecutive ``ver`` via the ``ivf.wave`` property;
    replays skip, gaps refuse. Per-wave cost is O(batch) (map-only
    GEMM assign + append fast path); :meth:`refresh` is O(table) by
    design and runs at maintenance cadence.

    PQ tier (round 16 — ``pq=True``, the FAISS IVFPQ production
    shape): postings additionally carry ``codes`` (m per-subspace
    product-quantization code indices) and ``norm``, encoded against
    per-subspace codebooks stored in a THIRD group member
    (``pqbooks``) so codes and the books that decode them version
    atomically with the postings. Serving's candidate pass reads
    (nid, codes, norm) — m·4 bytes instead of 4·dim — scores by
    asymmetric distance (per-query LUT gathers), and only the
    top-``rerank`` short list joins back to full vectors for the
    exact re-rank. ``refresh``/``stage_rebuild`` retrain and
    re-encode (refresh is also the upgrade path for a pre-PQ
    index); a cold handle self-detects PQ from the durable books."""

    def __init__(
        self,
        spark,
        base_dir: str,
        n_buckets: int = 8,
        pq: bool = False,
        pq_m: int = 8,
        pq_ksub: int = 64,
        pq_train_n: int = 2048,
    ):
        import os

        from ..storage import SnapshotGroup, SnapshotTable

        self.spark = spark
        self.postings = SnapshotTable(
            spark, os.path.join(base_dir, "postings"),
            key_cols=["cell", "nid"], order_col="__ver",
            n_buckets=n_buckets, bucket_cols=["cell"],
        )
        self.codebook = SnapshotTable(
            spark, os.path.join(base_dir, "codebook"),
            key_cols=["cell"], order_col="__ver", n_buckets=1,
        )
        # IVFPQ (round 16 — VERDICT r15 item 4; the FAISS IVFPQ
        # production shape): per-subspace PQ codebooks as a third
        # group member, versioned atomically with the postings they
        # encode. ``pq=True`` at create opts in; a fresh handle on an
        # existing PQ index self-detects from the durable table, so
        # serving needs no ctor flag.
        self.pqbooks = SnapshotTable(
            spark, os.path.join(base_dir, "pqbooks"),
            key_cols=["j", "kk"], order_col="__ver", n_buckets=1,
        )
        self._pq_requested = bool(pq)
        self.pq_m = int(pq_m)
        self.pq_ksub = int(pq_ksub)
        self.pq_train_n = int(pq_train_n)
        # (snapshot id, books) — the codebooks are immutable between
        # refreshes, so serving/wave hot paths must not re-collect
        # them per call (review r16); keyed by current_id, which a
        # refresh/publish moves
        self._pq_cache: "tuple[int | None, object]" = (None, None)
        self.group = SnapshotGroup(
            {
                "postings": self.postings,
                "codebook": self.codebook,
                "pqbooks": self.pqbooks,
            },
            base_dir,
        )

    @property
    def pq_enabled(self) -> bool:
        """PQ is on when requested at create OR already durable on
        disk (a cold serving handle needs no flag)."""
        return self._pq_requested or self.pqbooks.current_id() is not None

    def _pq_books_np(self):
        """The durable PQ codebooks as the (m, ksub, dsub) numpy
        array the encode/ADC kernels take, or ``None`` before the
        first trained wave. m·ksub·dsub floats — metadata-sized."""
        sid = self.pqbooks.current_id()
        if sid is None:
            return None
        if self._pq_cache[0] == sid:
            return self._pq_cache[1]
        rows = self.pqbooks.read().select("j", "kk", "vec").collect()
        if not rows:
            return None
        m = 1 + max(int(r["j"]) for r in rows)
        ksub = 1 + max(int(r["kk"]) for r in rows)
        dsub = len(rows[0]["vec"])
        books = np.zeros((m, ksub, dsub), dtype=np.float64)
        for r in rows:
            books[int(r["j"]), int(r["kk"])] = r["vec"]
        self._pq_cache = (sid, books)
        return books

    def _pq_books_df(self, books, ver: int) -> DataFrame:
        m, ksub, _ = books.shape
        return self.spark.createDataFrame(
            [
                (int(j), int(kk), [float(x) for x in books[j, kk]])
                for j in range(m)
                for kk in range(ksub)
            ],
            "j long, kk long, vec array<float>",
        ).withColumn("__ver", F.lit(int(ver)).cast("long"))

    def _train_pq_books(self, vecs: DataFrame):
        """Deterministic per-subspace k-means codebooks from the
        first ``pq_train_n`` vectors by nid (the :func:`pq_topk`
        sampling rule) — a driver-small training read; ``None`` on an
        empty frame."""
        train = (
            vecs.select("nid", "vec")
            .orderBy("nid")
            .limit(self.pq_train_n)
            .select("vec")
            .collect()
        )
        if not train:
            return None
        sample = np.array([r["vec"] for r in train], dtype=np.float64)
        return _pq_train_codebooks(sample, self.pq_m, self.pq_ksub)

    @staticmethod
    def _encode_postings(df: DataFrame, books) -> DataFrame:
        """``df`` (any schema containing ``vec``) with ``codes``
        (m subspace code indices, array<int>) and ``norm`` appended —
        the map-only Arrow pass that makes the serving scan m·4-byte
        codes instead of 4·dim-byte vectors (column pruning does the
        rest). Works for any nid type (unlike :func:`pq_encode`'s
        long-id contract)."""
        b = books

        def enc(batches):
            import numpy as _np

            m, ksub, dsub = b.shape
            for pdf in batches:
                out = pdf.copy()
                if not len(pdf):
                    out["codes"] = []
                    out["norm"] = []
                    yield out
                    continue
                V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
                out["norm"] = _np.linalg.norm(V, axis=1)
                codes = _np.empty((len(V), m), dtype=_np.int32)
                for j in range(m):
                    sub = V[:, j * dsub : (j + 1) * dsub]
                    d2 = (
                        (sub**2).sum(axis=1, keepdims=True)
                        - 2 * sub @ b[j].T
                        + (b[j] ** 2).sum(axis=1)[None, :]
                    )
                    codes[:, j] = d2.argmin(axis=1)
                out["codes"] = list(codes)
                yield out

        fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in df.schema.fields
        )
        return df.mapInPandas(
            enc, f"{fields}, codes array<int>, norm double"
        )

    def current_wave(self) -> int:
        """Last fully-committed wave (0 = none); heals the
        roll-forward window first."""
        self.group.recover()
        return int(self.postings.latest_property("ivf.wave") or 0)

    def centroids(self):
        """The DURABLE codebook as the row-normalized numpy matrix
        the probe/assign kernels take (cells ascending), or ``None``
        before the first non-empty wave. n_cells×dim floats — a
        metadata-sized driver read."""
        self.group.recover()
        if self.codebook.current_id() is None:
            return None
        rows = self.codebook.read().select("cell", "vec").collect()
        if not rows:
            return None
        rows.sort(key=lambda r: r["cell"])
        m = np.array([r["vec"] for r in rows], dtype=np.float64)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        return m / np.where(nrm == 0.0, 1.0, nrm)

    def wave(self, vectors: DataFrame, ver: int, n_cells: int = 16):
        """Index one wave of NEW ``(nid, vec)`` rows. Wave 1 (or the
        first non-empty wave) fits the codebook and commits it
        ATOMICALLY with its postings; later waves assign against the
        stored codebook map-only and append. An empty wave advances
        the checkpoint with metadata-only commits (the
        empty-micro-batch contract)."""
        done = self.current_wave()
        if done >= ver:
            return  # replayed wave — already committed, idempotent
        if done != ver - 1:
            raise ValueError(
                f"IvfIndex: wave {ver} cannot commit over checkpoint "
                f"{done} — waves are consecutive (replay the same "
                "ver, or the next)"
            )
        props = {"ivf.wave": ver}
        vecs = vectors.select("nid", "vec")
        cents = self.centroids()
        if cents is None:
            _, cents = kmeans_assign(vecs, n_cells)
            if cents is None:  # empty wave before any codebook:
                # metadata-only checkpoint advance on the members
                nid_t = vecs.schema["nid"].dataType.simpleString()
                post_cols = f"cell long, nid {nid_t}, " + (
                    "vec array<float>, codes array<int>, "
                    "norm double, __ver long"
                    if self.pq_enabled
                    else "vec array<float>, __ver long"
                )
                empties = {
                    "postings": self.spark.createDataFrame(
                        [], post_cols
                    ),
                    "codebook": self.spark.createDataFrame(
                        [], "cell long, vec array<float>, __ver long"
                    ),
                }
                if self.pq_enabled:
                    empties["pqbooks"] = self.spark.createDataFrame(
                        [], "j long, kk long, vec array<float>, "
                        "__ver long"
                    )
                self.group.append_all(empties, properties=props)
                return
            cb = self.spark.createDataFrame(
                [
                    (int(i), [float(x) for x in row])
                    for i, row in enumerate(cents)
                ],
                "cell long, vec array<float>",
            ).withColumn("__ver", F.lit(ver))
            assigned = (
                assign_to_centroids(vecs, cents)
                .select("cell", "nid", "vec")
                .withColumn("__ver", F.lit(ver))
            )
            ops = {
                "postings": ("append", assigned),
                "codebook": ("merge", cb),
            }
            if self.pq_enabled:
                books = self._train_pq_books(vecs)
                ops["postings"] = (
                    "append", self._encode_postings(assigned, books)
                )
                ops["pqbooks"] = (
                    "merge", self._pq_books_df(books, ver)
                )
            self.group.apply_all(ops, properties=props)
            return
        assigned = (
            assign_to_centroids(vecs, cents)
            .select("cell", "nid", "vec")
            .withColumn("__ver", F.lit(ver))
        )
        if self.pq_enabled:
            books = self._pq_books_np()
            if books is None:
                raise ValueError(
                    "IvfIndex: PQ requested on an index whose "
                    "postings predate PQ — run refresh() once to "
                    "train the codebooks and re-encode"
                )
            assigned = self._encode_postings(assigned, books)
        self.group.apply_all(
            {"postings": ("append", assigned)}, properties=props,
        )

    def refresh(
        self, n_cells: int | None = None, sample_fraction: float = 1.0,
        seed: int = 13,
    ):
        """MAINTENANCE (E119 with the durability this class adds):
        re-train the codebook over the accumulated postings, reassign
        every posting, and land BOTH as one mixed-verb transaction —
        the codebook a prober reads always matches the cell layout it
        prunes with. Returns the new centroid matrix (``None`` on an
        empty index — no commit)."""
        wave = self.current_wave()  # one recover + property walk
        old = self.centroids()
        if old is None:
            return None
        k = n_cells if n_cells is not None else int(old.shape[0])
        cents, reassigned = _retrain_reassign(
            self.postings, k, sample_fraction, seed
        )
        if cents is None:
            return None  # empty postings — nothing to rebalance
        cb = self.spark.createDataFrame(
            [
                (int(i), [float(x) for x in row])
                for i, row in enumerate(cents)
            ],
            "cell long, vec array<float>",
        ).withColumn("__ver", F.lit(wave).cast("long"))
        ops = {
            "postings": ("overwrite", reassigned),
            "codebook": ("overwrite", cb),
        }
        if self.pq_enabled:
            # retrain the PQ codebooks over the rebalanced postings
            # and re-encode — the refresh is ALSO the upgrade path
            # for a pre-PQ index (wave refuses until this runs; the
            # first books commit must APPEND — overwrite refuses on
            # a commit-less table)
            books = self._train_pq_books(reassigned)
            encoded = self._encode_postings(reassigned, books)
            if "codes" not in self.postings.read().columns:
                # upgrade: overwrite refuses NEW columns, so evolve
                # the postings schema first with a metadata-only
                # GROUP commit (members may only be written through
                # the group — a direct append would poison the txn
                # roll-forward)
                self.group.append_all(
                    {"postings": encoded.limit(0)},
                    properties={"ivf.pq.evolve": "1"},
                )
            ops["postings"] = ("overwrite", encoded)
            pq_verb = (
                "overwrite"
                if self.pqbooks.current_id() is not None
                else "append"
            )
            ops["pqbooks"] = (pq_verb, self._pq_books_df(books, wave))
        self.group.apply_all(
            ops,
            properties={
                "ivf.wave": wave,
                "ivf.refresh.cells": str(int(cents.shape[0])),
            },
        )
        return cents

    def stage_rebuild(
        self,
        name: str,
        n_cells: int | None = None,
        sample_fraction: float = 1.0,
        seed: int = 13,
    ):
        """Stage a full retrain + reassign on WAP branches of BOTH
        member tables (round 15 — the multi-table write-audit-publish
        consumer ``SnapshotGroup.publish_branches`` exists for): the
        rebuilt postings and the codebook that assigned them are
        staged INVISIBLY to probers, audited at leisure, and land
        together via :meth:`publish_rebuild` — or are discarded
        together with ``drop()`` — so a prober can never read a
        rebuilt codebook over the old cell layout, even across the
        maintenance window. Returns ``{"postings": SnapshotBranch,
        "codebook": SnapshotBranch}`` (``None`` on an empty index —
        nothing staged). Main is untouched until publish.

        Same cost shape as :meth:`refresh` (O(table) at maintenance
        cadence BY DESIGN); the branch commits carry the ``ivf.*``
        properties, which the squash publish propagates to main."""
        wave = self.current_wave()
        old = self.centroids()
        if old is None:
            return None
        k = int(n_cells) if n_cells is not None else int(old.shape[0])
        bp = bc = bq = None

        def discard():
            # best-effort: a failed drop must not mask the original
            # error or strand the OTHER members' branch markers
            for b in (bp, bc, bq):
                if b is None:
                    continue
                try:
                    b.drop()
                except Exception:  # noqa: BLE001 — cleanup path
                    pass

        try:
            bp = self.postings.create_branch(name)
            bc = self.codebook.create_branch(name)
            cents, reassigned = _retrain_reassign(
                bp, k, sample_fraction, seed
            )
            if cents is None:  # empty postings — nothing to rebuild
                discard()
                return None
            props = {
                "ivf.wave": wave,
                "ivf.refresh.cells": str(int(cents.shape[0])),
            }
            if self.pq_enabled:
                bq = self.pqbooks.create_branch(name)
                books = self._train_pq_books(reassigned)
                bdf = self._pq_books_df(books, wave)
                if bq.current_id() is None:  # upgrade: first commit
                    bq.append(bdf, properties=props)
                else:
                    bq.overwrite(bdf, properties=props)
                reassigned = self._encode_postings(reassigned, books)
                if "codes" not in bp.read().columns:
                    # upgrade staged on the branch: evolve the
                    # postings schema with a metadata-only branch
                    # append before the overwrite (same rule as
                    # refresh; branch commits stay branch-local)
                    bp.append(
                        reassigned.limit(0),
                        properties={"ivf.pq.evolve": "1"},
                    )
            bp.overwrite(reassigned, properties=props)
            cb = self.spark.createDataFrame(
                [
                    (int(i), [float(x) for x in row])
                    for i, row in enumerate(cents)
                ],
                "cell long, vec array<float>",
            ).withColumn("__ver", F.lit(wave).cast("long"))
            bc.overwrite(cb, properties=props)
        except Exception:
            discard()
            raise
        out = {"postings": bp, "codebook": bc}
        if bq is not None:
            out["pqbooks"] = bq
        return out

    def publish_rebuild(self, branches: dict) -> "dict[str, int]":
        """Atomically publish a staged rebuild (:meth:`stage_rebuild`):
        both members become visible in the same group-transaction
        instant or neither does — a failed member audit (caller drops
        instead) leaves BOTH tables at the fork base."""
        return self.group.publish_branches(branches)

    def topk(
        self,
        queries: DataFrame,
        k: int = 5,
        nprobe: int = 4,
        rerank: int = 64,
    ) -> DataFrame:
        """Top-``k`` neighbors per (query_id, vec) query row over
        everything indexed so far: probe ``nprobe`` cells against the
        durable codebook, read only those cells' buckets, exact
        re-rank (:func:`topk_from_cells`).

        On a PQ index the candidate pass is ASYMMETRIC-DISTANCE over
        the stored codes (the FAISS IVFPQ serving shape): the probed
        cells' scan reads (nid, codes, norm) — m·4 bytes of codes
        instead of 4·dim bytes of vector, and the (query × candidate)
        join moves codes, not vectors — then only the per-query
        top-``rerank`` short list joins back to full vectors for the
        EXACT re-rank, so emitted cosines are exact and only recall
        is approximate (rises with rerank/nprobe). Query sets larger
        than the driver-small contract fall back to the exact path
        (same output contract)."""
        cents = self.centroids()
        if cents is None:
            # cold start: derive neighbor_id's type from the postings
            # schema when a (possibly empty) commit exists, so string-
            # keyed indexes answer the same schema cold and warm
            # (review r13); before ANY commit, long is the default
            nid_t = "long"
            if self.postings.current_id() is not None:
                m = self.postings._manifest(self.postings.current_id())
                nid_t = (
                    self.postings._schema_of(m)["nid"]
                    .dataType.simpleString()
                )
            return self.spark.createDataFrame(
                [],
                f"query_id long, neighbor_id {nid_t}, "
                "cos double, rn long",
            )
        q = queries.select("query_id", "vec")
        probes = ivf_probe_cells(q, cents, nprobe=nprobe)
        if self.pq_enabled:
            out = self._topk_pq(q, probes, k=k, rerank=rerank)
            if out is not None:
                return out
        pruned = self.postings.read_matching(probes.select("cell"))
        return topk_from_cells(probes, pruned, k=k)

    def _topk_pq(
        self, q: DataFrame, probes: DataFrame, k: int, rerank: int
    ):
        """The ADC candidate pass + exact re-rank (see :meth:`topk`).
        Returns ``None`` to fall back to the exact path (no durable
        codebooks yet, or a query set past the driver-small
        contract)."""
        books = self._pq_books_np()
        if books is None:
            return None
        q_rows = q.limit(DRIVER_SMALL_MAX_QUERIES + 1).collect()
        if not q_rows or len(q_rows) > DRIVER_SMALL_MAX_QUERIES:
            return None
        qids = [r["query_id"] for r in q_rows]
        Q = np.array([r["vec"] for r in q_rows], dtype=np.float64)
        q_norms = np.linalg.norm(Q, axis=1)
        m, ksub, dsub = books.shape
        lut = np.einsum(
            "qjd,jkd->qjk", Q.reshape(len(Q), m, dsub), books
        )
        qindex = {qid: i for i, qid in enumerate(qids)}
        # ONE bucket-pruned read serves both passes (round 17): the
        # candidate scan prunes to (nid, codes, norm) and the re-rank
        # below to (nid, vec) through their own selects, but the
        # driver-side probe (distinct bucket ids -> file list) runs
        # once instead of twice.
        pruned_all = self.postings.read_matching(probes.select("cell"))
        pruned = pruned_all.select("cell", "nid", "codes", "norm")
        cand = probes.select("query_id", "cell").join(pruned, "cell")
        nid_t = pruned.schema["nid"].dataType.simpleString()

        def adc(batches):
            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                if not len(pdf):
                    continue
                qi = (
                    pdf["query_id"].map(qindex).to_numpy(dtype=_np.int64)
                )
                codes = _np.array(
                    pdf["codes"].tolist(), dtype=_np.int64
                )
                dots = _np.zeros(len(pdf))
                for j in range(m):
                    dots += lut[qi, j, codes[:, j]]
                denom = _np.maximum(
                    q_norms[qi] * pdf["norm"].to_numpy(), 1e-12
                )
                yield _pd.DataFrame(
                    {
                        "query_id": pdf["query_id"],
                        "neighbor_id": pdf["nid"],
                        "approx": dots / denom,
                    }
                )

        scored = cand.mapInPandas(
            adc, f"query_id long, neighbor_id {nid_t}, approx double"
        ).filter(F.col("query_id") != F.col("neighbor_id"))
        w0 = Window.partitionBy("query_id").orderBy(
            F.col("approx").desc(), "neighbor_id"
        )
        short = (
            scored.withColumn("rn0", F.row_number().over(w0))
            .filter(F.col("rn0") <= int(rerank))
            .select("query_id", "neighbor_id")
        )
        # exact re-rank: the probed cells' vec column, short-list
        # rows only (the scan is still bucket-pruned; the join moves
        # rerank·|Q| vectors, never the candidate set)
        vecs = (
            pruned_all.select(
                F.col("nid").alias("neighbor_id"),
                F.col("vec").alias("c_vec"),
            )
            .dropDuplicates(["neighbor_id"])
        )
        qv = q.select("query_id", F.col("vec").alias("q_vec"))
        rer = (
            short.join(vecs, "neighbor_id")
            .join(F.broadcast(qv), "query_id")
            .withColumn("cos", cosine("q_vec", "c_vec"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), "neighbor_id"
        )
        return (
            rer.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select(
                "query_id",
                "neighbor_id",
                F.round("cos", 4).alias("cos"),
                F.col("rn").cast("long").alias("rn"),
            )
        )


def srp_lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    planes: int = 4,
    tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a bucket
    with the query in ANY of ``tables`` independent signature tables,
    exact cosine re-rank on candidates only.

    At scale: corpus signatures are map-only; each table's lookup is a
    shuffle keyed on (table, bucket) — 2^planes buckets per table keeps
    partitions balanced. Increasing ``tables`` raises recall at linear
    cost; ``planes`` trades bucket size vs. collision rate."""
    q_sigs = (
        srp_bucket_vectors(queries, id_col, vec_col, "query_id", dim, planes, tables)
        .select(
            "query_id",
            F.col("vec").alias("q_vec"),
            F.posexplode("buckets").alias("tbl", "bucket"),
        )
    )
    c_sigs = (
        srp_bucket_vectors(corpus, id_col, vec_col, "neighbor_id", dim, planes, tables)
        .select(
            "neighbor_id",
            F.col("vec").alias("c_vec"),
            F.posexplode("buckets").alias("tbl", "bucket"),
        )
    )

    cands = (
        q_sigs.join(c_sigs, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "q_vec", "neighbor_id", "c_vec")
        .distinct()
    )
    scored = cands.withColumn("cos", cosine("q_vec", "c_vec"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def _pq_train_codebooks(
    sample: np.ndarray, m: int, ksub: int, iters: int = 10
) -> np.ndarray:
    """(m, ksub, dsub) codebooks via per-subspace k-means on a
    driver-small training sample. Deterministic: seeds are the first
    ksub distinct subvectors; ties in assignment break toward the
    lower code. Pure numpy — the sample is metadata-scale by contract
    (codebooks generalize from a few thousand vectors; training never
    needs the corpus)."""
    n, dim = sample.shape
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = sample[:, j * dsub : (j + 1) * dsub]
        # deterministic distinct seeding
        _, idx = np.unique(sub.round(9), axis=0, return_index=True)
        seeds = sub[np.sort(idx)[:ksub]]
        if len(seeds) < ksub:  # degenerate corpus: pad by repetition
            seeds = np.resize(seeds, (ksub, dsub))
        cb = seeds.copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for kk in range(ksub):
                mask = assign == kk
                if mask.any():
                    cb[kk] = sub[mask].mean(axis=0)
        books[j] = cb
    return books


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: np.ndarray,
) -> DataFrame:
    """(id, codes array<int>, norm) — each vector compressed to m
    subspace code indices plus its L2 norm. Map-only over Arrow
    batches; this is the pass that turns 4·dim bytes/vector into
    m bytes (+4 for the norm) — the PQ memory story. The codebook
    array ships by value in the closure (m·ksub·dsub floats, tiny)."""
    books = codebooks

    def encode(batches):
        import numpy as _np
        import pandas as _pd

        m, ksub, dsub = books.shape
        for pdf in batches:
            V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
            norms = _np.linalg.norm(V, axis=1)
            codes = _np.empty((len(V), m), dtype=_np.int64)
            for j in range(m):
                sub = V[:, j * dsub : (j + 1) * dsub]
                d2 = (
                    (sub**2).sum(axis=1, keepdims=True)
                    - 2 * sub @ books[j].T
                    + (books[j] ** 2).sum(axis=1)[None, :]
                )
                codes[:, j] = d2.argmin(axis=1)
            yield _pd.DataFrame(
                {
                    "out_id": pdf["out_id"],
                    "codes": list(codes),
                    "norm": norms,
                }
            )

    return df.select(
        F.col(id_col).alias("out_id"), F.col(vec_col).alias("vec")
    ).mapInPandas(encode, "out_id long, codes array<bigint>, norm double")


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    rerank: int = 64,
    train_n: int = 2048,
    max_driver_queries: int = DRIVER_SMALL_MAX_QUERIES,
) -> DataFrame:
    """Approximate top-k cosine via product quantization + asymmetric
    distance, exact re-rank of the short list.

    The 100 TB memory story: the scoring pass reads m bytes per corpus
    vector (codes) instead of 4·dim — a 64-dim float corpus shrinks
    32× in the scan that dominates ANN cost. Pipeline:

    1. TRAIN (driver, deterministic): per-subspace k-means codebooks
       from the first ``train_n`` vectors by id — metadata-scale.
    2. ENCODE (distributed, map-only): ``pq_encode`` → (id, m codes,
       norm).
    3. ADC SCAN (distributed, map-only): per query, a (m × ksub) LUT
       of subspace dot products; approx dot(q, v) = Σⱼ LUT[j, code[j]]
       — each corpus batch scores as LUT gathers, no float vectors
       touched; per-batch top-``rerank`` short list.
    4. RERANK (exact): join the short list back to full vectors, JVM
       fold-order cosine, window top-k — so emitted VALUES are exact
       cosines; only RECALL is approximate (rises with rerank/ksub/m).

    Queries ride the driver-small contract (like cosine_topk_blocked),
    ENFORCED by the same probe: a query set larger than
    ``max_driver_queries`` dispatches to the fully-distributed exact
    ``cosine_topk_tiled`` (same output contract; recall contract holds
    trivially since tiled is exact) instead of collecting |Q| vectors
    and shipping a |Q|·m·ksub LUT in the ADC closure."""
    q_rows = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("vec")
        )
        .limit(max_driver_queries + 1)
        .collect()
    )
    if len(q_rows) > max_driver_queries:
        return cosine_topk_tiled(queries, corpus, id_col, vec_col, k=k)

    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("vec"))
    )
    train_rows = c.orderBy("nid").limit(train_n).select("vec").collect()
    if not q_rows or not train_rows:
        return _empty_topk(queries)
    sample = np.array([r.vec for r in train_rows], dtype=np.float64)
    books = _pq_train_codebooks(sample, m, ksub)

    enc = pq_encode(corpus, id_col, vec_col, books)

    qids = np.array([r.query_id for r in q_rows], dtype=np.int64)
    Q = np.array([r.vec for r in q_rows], dtype=np.float64)
    q_norms = np.linalg.norm(Q, axis=1)
    m_, ksub_, dsub = books.shape
    # LUT[i, j, kk] = dot(q_i subspace j, codeword kk)
    lut = np.einsum(
        "qjd,jkd->qjk",
        Q.reshape(len(Q), m_, dsub),
        books,
    )
    take = rerank

    def adc(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            codes = _np.array(pdf["codes"].tolist(), dtype=_np.int64)
            norms = pdf["norm"].to_numpy()
            nids = pdf["nid"].to_numpy()
            # approx dot via LUT gathers: (nq, nb) — one fancy-index
            # gather per subspace (m_ is small; each gather is a
            # (nq, nb) slice pick out of the (nq, ksub) LUT plane)
            dots = _np.zeros((lut.shape[0], len(codes)))
            for j in range(m_):
                dots += lut[:, j, codes[:, j]]
            denom = _np.maximum(q_norms[:, None] * norms[None, :], 1e-12)
            cos_approx = dots / denom
            cos_approx[qids[:, None] == nids[None, :]] = -_np.inf
            t = min(take, cos_approx.shape[1])
            idx = _np.argpartition(-cos_approx, t - 1, axis=1)[:, :t]
            yield _pd.DataFrame(
                {
                    "query_id": _np.repeat(qids, t),
                    "neighbor_id": nids[idx.reshape(-1)],
                }
            )

    cands = enc.withColumnRenamed("out_id", "nid").mapInPandas(
        adc, "query_id long, neighbor_id long"
    )

    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        cands.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .withColumn("cos", cosine("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos", 4).alias("cos"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


def recall_contract(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    floor_pct: int,
) -> DataFrame:
    """Deterministic correctness contract for an approximate top-k.

    Approximate ANN results are not SQL-reproducible (their candidate
    sets depend on engine-side centroids/hyperplanes/codebooks), so
    instead of hashing neighbor lists the query emits ONE row of
    constants that only holds when the algorithm works: exact recall@k
    against the in-Spark brute-force top-k, thresholded at
    ``floor_pct``. The DuckDB oracle emits the same literals, so the
    driver's row/schema/value-hash check fails exactly when recall
    drops below the floor (``meets_floor`` flips to 0) or the result
    cardinality breaks (``n_true`` changes).

    Both inputs must carry (query_id, neighbor_id) rows; ``exact`` is
    the ground truth (n_true = |Q|·k rows). All aggregation is
    distributed; only the single contract row reaches the driver.
    """
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    total = exact.agg(F.count(F.lit(1)).alias("n_true"))
    return hits.crossJoin(total).select(
        F.lit(k).cast("long").alias("k"),
        F.lit(floor_pct).cast("long").alias("floor_pct"),
        F.col("n_true").cast("long").alias("n_true"),
        (F.col("n_hits") * 100 >= F.col("n_true") * floor_pct)
        .cast("long")
        .alias("meets_floor"),
    )
