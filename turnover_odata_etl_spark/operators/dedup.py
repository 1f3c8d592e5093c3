"""Deduplication family (SURVEY §2.12 E8) — exact through near-dup.

The reference's only dedup is a full-row ``drop_duplicates`` after
stringifying cells (reference: src/etl.py:180-209). At training-data
scale the useful ladder is:

1. exact full-row dedup            → ``relational.dedup_rows``
2. normalized-fingerprint dedup    → ``fingerprint_dedup`` (md5 of
   canonicalized text; catches formatting variants; one hash-agg)
3. MinHash + LSH banding near-dup  → ``near_dup_pairs`` (sub-quadratic
   candidate generation + exact-Jaccard verification)
4. SimHash near-dup                → ``simhash`` (64-bit signature;
   hamming-ball lookup; Pandas-UDF/Arrow path)

Determinism note: MinHash uses blake2b base hashes + fixed affine
per-slot constants — no RNG anywhere — so the whole pipeline is
reproducible run-to-run, which the correctness gate (and any
production backfill) needs.

Scale shape of ``near_dup_pairs``: shingling and signatures are
map-only; the only shuffles are the band-bucket self-join (keyed on
band hash — uniformly distributed by construction, no skew) and the
verify join back to shingle sets. The candidate set is ~|true pairs| +
false-positive noise, not O(n²). With 32 bands × 2 rows the candidate-miss
probability at Jaccard 0.6 is (1−0.6²)³² ≈ 6·10⁻⁷, so recall loss is
negligible —
the exact-verify step then removes all false positives, making the
output equal (w.h.p.) to the brute-force pairs the DuckDB oracle
computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import fingerprint

# -- tier 2: normalized fingerprint ----------------------------------------


def fingerprint_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Attach md5-of-normalized-text fingerprint and a ``keep`` flag
    (smallest id per fingerprint wins; ids are unique per row — the
    table-key contract — so this is exactly first-id-wins).

    Shape: groupBy ``min(id)`` + join-back rather than a
    ``Window.partitionBy(fingerprint)`` — the same de-skew as
    :func:`duplicate_spans` stage 2 (VERDICT r07 item 2, applied here
    opportunistically per its "What's wrong #2"): a window partition
    is ONE task holding every row of one fingerprint sorted, so a
    pathological corpus (one document duplicated 10⁸×) becomes a
    single straggler; ``min`` partial-aggregates map-side, absorbing
    the hot key before the exchange, and the join back is AQE-skew-
    splittable. Duplicate-group sizes for whole-document hashes are
    far less skewed than k-gram frequencies, but the safe shape costs
    nothing here — one extra broadcast-sized join.

    Null safety (ADVICE r08): ``fingerprint(NULL text)`` is NULL, and a
    plain equi-join would silently drop those rows (SQL ``NULL !=
    NULL``) — a data-loss contract change vs the window formulation it
    replaced, where all null-fingerprint rows share ONE partition and
    the smallest id keeps. ``eqNullSafe`` (``<=>``) restores exactly
    the window semantics; Catalyst still extracts it as an equi-join
    key (coalesced), so the plan stays a hash join."""
    fp = df.withColumn("fingerprint", fingerprint(text_col))
    canon = fp.groupBy("fingerprint").agg(
        F.min(id_col).alias("__canon_id")
    ).withColumnRenamed("fingerprint", "__canon_fp")
    return (
        fp.join(canon, F.col("fingerprint").eqNullSafe(F.col("__canon_fp")))
        .withColumn("keep", F.col(id_col) == F.col("__canon_id"))
        .select(*df.columns, "fingerprint", "keep")
    )


# -- tier 3: MinHash + LSH --------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 64,
    shingle_k: int = 3,
    bands: int = 32,
    rows_per_band: int = 2,
) -> DataFrame:
    """(doc_id, shingles, sig, buckets) per document.

    sig[i] = min over shingles of an affine transform of a 64-bit base
    hash of the shingle; buckets[b] = hash of the band's signature
    slice (the LSH bucket keys, precomputed here so candidate
    generation is a plain explode+join downstream).

    Implementation note (measured, not guessed): the original
    pure-column form (32 × ``array_min(transform(...))`` higher-order
    functions) ran ~3.5 s steady-state at sf0.1 because Catalyst HOFs
    are interpreted per-element — ~10 µs per lambda invocation × 8 M
    invocations, all fixed overhead, not data volume. This
    ``mapInPandas`` form vectorizes the same arithmetic in numpy over
    Arrow batches (~100 ns/element) and stays map-only — at 100 TB it
    scales identically (per-partition work, no shuffle) while being
    ~20× cheaper per row. Determinism: blake2b base hashes + fixed
    affine constants, no RNG.
    """
    raw = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))

    n_hash, n_bands, n_rows, k = num_hashes, bands, rows_per_band, shingle_k

    def compute(batches):
        # Self-contained closure: cloudpickle ships it by value; Python
        # workers can't import this package (see simhash note below).
        import hashlib as _hashlib
        import re as _re

        import numpy as _np
        import pandas as _pd

        _ws = _re.compile(r"\s+", _re.ASCII)  # Java-regex-compatible \s

        def _shingles(text: str) -> list[str]:
            # Mirrors functions.text.word_shingles (and the DuckDB
            # oracle): ASCII-whitespace tokens of trimmed text;
            # distinct k-word shingles; short docs yield one shingle
            # of the whole text.
            t = text.strip()
            toks = _ws.split(t) if t else []
            if len(toks) >= k:
                return list(
                    dict.fromkeys(
                        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                    )
                )
            return [" ".join(toks)]

        # Fixed odd multipliers / offsets per slot, derived from the
        # slot index via blake2b — deterministic across runs/machines.
        # All arithmetic is uint64 with C wraparound (mod 2^64), which
        # a multiply-shift universal hash family tolerates fine.
        def _const(tag: str, i: int) -> int:
            d = _hashlib.blake2b(f"{tag}:{i}".encode(), digest_size=8).digest()
            return int.from_bytes(d, "big")

        A = _np.array([_const("a", i) | 1 for i in range(n_hash)], dtype=_np.uint64)
        B = _np.array([_const("b", i) for i in range(n_hash)], dtype=_np.uint64)
        C = _np.array(
            [_const("band", b) | 1 for b in range(n_bands * n_rows)],
            dtype=_np.uint64,
        ).reshape(n_bands, n_rows)

        def _base(s: str) -> int:
            return int.from_bytes(
                _hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"
            )

        for pdf in batches:
            shingle_col, sigs, bucket_col = [], [], []
            for text in pdf["text"]:
                shingles = _shingles(text)
                h = _np.array([_base(s) for s in shingles], dtype=_np.uint64)
                # (n_hash, n_shingles) affine transforms, wrap mod 2^64
                sig = (A[:, None] * h[None, :] + B[:, None]).min(axis=1)
                # band bucket = dot of the band's signature slice with
                # fixed odd constants (mod 2^64) — one vectorized pass
                buckets = (sig.reshape(n_bands, n_rows) * C).sum(
                    axis=1, dtype=_np.uint64
                )
                shingle_col.append(shingles)
                sigs.append(sig.astype(_np.int64))
                bucket_col.append(buckets.astype(_np.int64))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "shingles": shingle_col,
                    "sig": sigs,
                    "buckets": bucket_col,
                }
            )

    return raw.mapInPandas(
        compute,
        "doc_id long, shingles array<string>, sig array<bigint>, buckets array<bigint>",
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 32, rows_per_band: int = 2
) -> DataFrame:
    """Distinct (a_id, b_id) pairs sharing ≥1 LSH band bucket.

    Bucket keys are precomputed by ``minhash_signatures`` (one hash of
    each band's signature slice); here it's a plain posexplode +
    self-join keyed on (band, bucket), so work is proportional to
    bucket sizes, which stay tiny because minhash values are uniform."""
    banded = sig_df.select(
        "doc_id", F.posexplode("buckets").alias("band", "bucket")
    )

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )


def exact_jaccard(
    pairs: DataFrame, sig_df: DataFrame, threshold: float
) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard
    (|A∩B| / (|A|+|B|−|A∩B|) — same formula as the SQL oracle) and
    keep pairs ≥ threshold."""
    sh = sig_df.select("doc_id", "shingles")
    a = sh.select(
        F.col("doc_id").alias("a_id"), F.col("shingles").alias("a_sh")
    )
    b = sh.select(
        F.col("doc_id").alias("b_id"), F.col("shingles").alias("b_sh")
    )
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size("a_sh") + F.size("b_sh") - F.size(
        F.array_intersect("a_sh", "b_sh")
    )
    # Filter on the UNROUNDED jaccard (matching the SQL oracle and
    # ngram_jaccard_pairs); round only the projected output column — a
    # pair with true Jaccard in [threshold-5e-5, threshold) must not
    # survive via round-up.
    return (
        pairs.join(a, "a_id")
        .join(b, "b_id")
        .withColumn("__jac_raw", inter / union)
        .filter(F.col("__jac_raw") >= threshold)
        .select("a_id", "b_id", F.round("__jac_raw", 4).alias("jac"))
    )


def near_dup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
    rows_per_band: int = 2,
    shingle_k: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle → signature → band
    buckets → candidate pairs → exact-Jaccard verify ≥ threshold.

    The signature frame feeds four plan branches (both sides of the
    band self-join, both sides of the verify join); without a persist
    Spark recomputes shingling+hashing 4× — measured ~4× slower at
    sf0.1. MEMORY_AND_DISK so oversized corpora spill instead of OOM."""
    from pyspark import StorageLevel

    # Shingling+hashing is the CPU-heavy stage; a small fixture file
    # arrives as 1-2 input partitions, which would serialize it. The
    # repartition cost (shuffling raw text once) is tiny next to
    # 32 hashes × |shingles| per doc.
    spark = df.sparkSession
    df = df.repartition(spark.sparkContext.defaultParallelism)
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    return exact_jaccard(cands, sigs, threshold)


# -- tier 3b: exact n-gram Jaccard via inverted index -----------------------


def shingle_hash_table(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """Exploded inverted-index input: one row per (doc_id, n_shingles,
    64-bit shingle hash). Shingling + hashing vectorized over Arrow
    batches (same rationale as ``minhash_signatures``: interpreted
    column HOFs cost ~10 µs/element); joins downstream key on the LONG
    hash instead of the shingle string — cheaper shuffle + probe.
    blake2b(8B) collisions among distinct shingles are ~n²/2⁶⁵
    (≈10⁻¹¹ at 10⁶ shingles) — the standard w.h.p. trade."""
    raw = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    k = shingle_k

    def compute(batches):
        import hashlib as _hashlib
        import re as _re

        import pandas as _pd

        _ws = _re.compile(r"\s+", _re.ASCII)

        for pdf in batches:
            ids, ns, hs = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                t = text.strip()
                toks = _ws.split(t) if t else []
                if len(toks) >= k:
                    shingles = set(
                        " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
                    )
                else:
                    shingles = {" ".join(toks)}
                n = len(shingles)
                for s in shingles:
                    ids.append(doc_id)
                    ns.append(n)
                    hs.append(
                        int.from_bytes(
                            _hashlib.blake2b(s.encode(), digest_size=8).digest(),
                            "big",
                            signed=False,
                        )
                        - (1 << 63)
                    )
            yield _pd.DataFrame({"doc_id": ids, "n": ns, "sh": hs})

    return raw.mapInPandas(compute, "doc_id long, n long, sh long")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT all-pairs n-gram (k-word shingle) Jaccard ≥ threshold,
    computed with an inverted index instead of a cross join: explode
    (doc, shingle-hash), self-join on the hash, count co-occurrences —
    |A∩B| — then Jaccard from the counts alone. No verification pass
    needed because the counts are exact (w.h.p., see
    ``shingle_hash_table``).

    Complement to the MinHash path: exact answer, but candidate work is
    Σ_shingle freq² — fine while shingles are selective (k ≥ 3 keeps
    them so), degenerate if a shingle appears in thousands of docs. At
    100 TB: cap hot shingles (drop shingles with document frequency
    above a bound from the *index* — standard prefix-filter trade-off,
    documented recall caveat) or fall back to MinHash+LSH."""
    spark = df.sparkSession
    tok = shingle_hash_table(
        df.repartition(spark.sparkContext.defaultParallelism),
        text_col,
        id_col,
        shingle_k,
    )
    a = tok.select(F.col("doc_id").alias("a_id"), F.col("n").alias("na"), "sh")
    b = tok.select(F.col("doc_id").alias("b_id"), F.col("n").alias("nb"), "sh")
    inter = (
        a.join(b, ["sh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    jac = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.withColumn("jac", F.round(jac, 4))
        .filter(jac >= threshold)
        .select("a_id", "b_id", "jac")
    )


# -- tier 4: SimHash (Pandas-UDF / Arrow path) ------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, shingle_k: int = 3
) -> DataFrame:
    """64-bit SimHash per document via ``mapInPandas`` (Arrow-batched;
    the deliberate demonstration of the vectorized Python path —
    SURVEY §2.12 E15). Deterministic: md5-derived bit vectors, no RNG.

    Output: (doc_id, simhash:string hex, sig:int64, bands:4×int16
    slices). Near-dup = small hamming distance between signatures;
    ``simhash_neardup_pairs`` finds them by banding (pigeonhole: any
    pair at hamming ≤ 3 agrees on ≥ 1 of the 4 bands — the search is
    EXACT for that radius, not probabilistic).
    """
    # Tokenize ONCE: materialize the token array as a generator-output
    # attribute, then shingle from the attribute — the aliased-split
    # form re-splits the text per transform iteration inside the
    # interpreted HOF path (see functions/text.word_shingles PERF note).
    from ..functions.text import tokens, word_shingles_from

    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(tokens(text_col))).alias("toks"),
    ).select("doc_id", word_shingles_from(F.col("toks"), shingle_k).alias("shingles"))

    # The closure must be fully self-contained (stdlib/pandas imports
    # only, no references to this module's globals): cloudpickle ships
    # it by value, and Spark's Python workers cannot import this
    # package unless the driver happens to run from the repo root.
    def compute(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out_ids, out_sigs, out_lng, out_bnd = [], [], [], []
            for doc_id, shingles in zip(pdf["doc_id"], pdf["shingles"]):
                acc = [0] * 64
                for s in shingles:
                    h = int.from_bytes(
                        _hashlib.md5(s.encode()).digest()[:8], "big", signed=False
                    )
                    for bit in range(64):
                        acc[bit] += 1 if (h >> bit) & 1 else -1
                sig = 0
                for bit in range(64):
                    if acc[bit] > 0:
                        sig |= 1 << bit
                out_ids.append(doc_id)
                out_sigs.append(f"{sig:016x}")
                out_lng.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
                out_bnd.append([(sig >> (16 * b)) & 0xFFFF for b in range(4)])
            yield _pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "simhash": out_sigs,
                    "sig": out_lng,
                    "bands": out_bnd,
                }
            )

    return shingled.mapInPandas(
        compute, "doc_id long, simhash string, sig long, bands array<long>"
    )


def simhash_neardup_pairs(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """All pairs with SimHash hamming distance ≤ ``max_hamming`` —
    EXACT for max_hamming ≤ 3 by pigeonhole over the 4 16-bit bands
    (a pair differing in ≤ 3 bits cannot differ in all 4 bands).
    Candidate generation is the banded self-join (uniform band keys,
    same skew-free shape as MinHash LSH); verification is one
    ``bit_count(xor)`` per candidate, JVM-side."""
    spark = df.sparkSession
    sigs = simhash_signatures(
        df.repartition(spark.sparkContext.defaultParallelism), text_col, id_col
    )
    return hamming_neardup_pairs(sigs, max_hamming)


# Single-slot holder for hamming_neardup_pairs' persisted signature
# frame (see its docstring for the release protocol).
_LAST_PERSISTED_SIGS: list = [None]


def hamming_neardup_pairs(sigs: DataFrame, max_hamming: int = 3) -> DataFrame:
    """All pairs of 64-bit signatures within ``max_hamming`` bits —
    the banding engine shared by the SimHash (text) and perceptual-
    hash (image) near-dup tiers. ``sigs`` carries
    ``(doc_id, sig:int64, bands:4×int16-slices)`` from any signature
    producer.

    EXACT for max_hamming ≤ 3: a pair differing in ≤ 3 of 64 bits
    cannot differ in all 4 bands (pigeonhole), so the banded
    self-join generates every qualifying pair; the ``bit_count(xor)``
    verification then removes false candidates. Scale: band keys are
    near-uniform 16-bit values, so the self-join is skew-free; the
    signature frame is persisted because it feeds both the candidate
    and the verification sides. The cache can only be released after
    the caller materializes the result (the plan is lazy), so each
    invocation unpersists the PREVIOUS invocation's frame — bounding
    the session to one cached signature frame at a time instead of
    one per call (at worst an already-released frame recomputes; it
    can never produce wrong results)."""
    from pyspark import StorageLevel

    prior = _LAST_PERSISTED_SIGS.pop()
    if prior is not None:
        prior.unpersist(blocking=False)
    sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)
    _LAST_PERSISTED_SIGS.append(sigs)
    banded = sigs.select("doc_id", F.posexplode("bands").alias("band", "bval"))
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sa = sigs.select(F.col("doc_id").alias("a_id"), F.col("sig").alias("a_sig"))
    sb = sigs.select(F.col("doc_id").alias("b_id"), F.col("sig").alias("b_sig"))
    return (
        cands.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn(
            "hamming",
            F.bit_count(F.col("a_sig").bitwiseXOR(F.col("b_sig"))).cast("long"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("a_id", "b_id", "hamming")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT all-pairs token-set Jaccard ≥ threshold via PREFIX
    FILTERING (Bayardo et al., "Scaling Up All Pairs Similarity
    Search", WWW'07 — the All-Pairs/PPJoin family): under one global
    token order, any two sets with J ≥ t must share a token within
    each other's first ``|d| − ⌈t·|d|⌉ + 1`` tokens, so only PREFIX
    tokens are indexed and self-joined — candidate cost is
    Σ_prefix-token freq², a large constant-factor cut versus indexing
    every token (the ``ngram_jaccard_pairs`` posture), because the
    global order puts the RAREST tokens first and prefixes are short.
    Candidates then verify exactly with an array intersection.

    Ordering ties break (frequency, token) so the order — and hence
    the candidate set — is fully deterministic. The global rank is a
    window over the VOCABULARY (sublinear in corpus size); at 100 TB
    vocabulary ranking shards by hash then merges, or reuses a
    persisted dictionary — the corpus itself only ever explodes its
    prefixes."""
    spark = df.sparkSession  # noqa: F841 — parity with sibling helpers
    toks = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("__t"))
        .filter(F.trim("__t") != "")
        .select(
            "doc_id",
            F.explode(F.array_distinct(F.split(F.trim("__t"), r"\s+"))).alias(
                "tok"
            ),
        )
    )
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    rank = vocab.withColumn(
        "rnk",
        F.row_number().over(Window.orderBy("freq", "tok")),
    ).select("tok", "rnk")
    ranked = toks.join(F.broadcast(rank), "tok").join(sizes, "doc_id")
    # ceil in double arithmetic: when t*n is exactly integral the
    # product can land one ulp ABOVE the integer, making ceil one too
    # large and the prefix one token short — a false negative in an
    # operator documented EXACT. The 1e-9 guard absorbs the ulp without
    # ever admitting a genuinely fractional t*n (token counts are small
    # integers, so true fractional parts are >= 1/n >> 1e-9).
    prefix_len = (
        F.col("n") - F.ceil(F.lit(threshold) * F.col("n") - F.lit(1e-9)) + 1
    )
    prefixes = (
        ranked.withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("rnk")
            ),
        )
        .filter(F.col("pos") <= prefix_len)
        .select("doc_id", "tok")
    )
    cand = (
        prefixes.alias("a")
        .join(prefixes.alias("b"), "tok")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id")
        )
        .distinct()
    )
    sets = toks.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("tok")).alias("s")
    )
    verified = (
        cand.join(
            sets.select(F.col("doc_id").alias("a_id"), F.col("s").alias("sa")),
            "a_id",
        )
        .join(
            sets.select(F.col("doc_id").alias("b_id"), F.col("s").alias("sb")),
            "b_id",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jac",
            F.col("inter")
            / (F.size("sa") + F.size("sb") - F.col("inter")),
        )
        .filter(F.col("jac") >= threshold)
    )
    return verified.select("a_id", "b_id", F.round("jac", 4).alias("jac"))


# -- tier 5: span-level exact-substring dedup ------------------------------


def duplicate_spans(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    k: int = 8,
    hash_shingles: bool = False,
) -> DataFrame:
    """Cross-document EXACT-SUBSTRING duplicate spans — the span-level
    rung of the dedup ladder (document-level tiers above miss the
    boilerplate/license-header/quotation case where otherwise-distinct
    documents share long verbatim runs; the published recipe is
    suffix-array ExactSubstr dedup, Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better").

    Distributed shape (the suffix array's job is finding repeated
    k-grams; a shuffle-on-shingle does the same without a global
    sorted structure):

    1. explode positioned k-token shingles (map-side, one Generate);
    2. a partial-aggregable groupBy on the shingle — per key
       ``cnt = count(*)`` and ``canonical = min(struct(id, pos))``
       (keep-one semantics: the lexicographically-first copy of a
       repeated passage survives) — then a join back of occurrences
       to the ``cnt > 1`` keys, keeping every occurrence that is not
       its key's canonical;
    3. ONE shuffle keyed on the document: merge overlapping/adjacent
       duplicate k-gram positions into MAXIMAL spans (gaps-and-islands
       over a running max of span ends — the same sweep as the E45
       concurrency operator).

    Returns ``(id_col, span_start, span_end)`` — token offsets,
    end-exclusive, 0-based; downstream removal is one ``slice`` per
    span complement.

    Scale posture: the corpus text never shuffles — stage 2 moves
    ``(key, id, pos)`` rows where ``key`` is the shingle string, or
    an 8-byte ``xxhash64`` when ``hash_shingles=True`` (the 100-TB
    setting: narrows the exchange ~10×; collisions ~n²/2⁻⁶⁴ merge
    unrelated spans with negligible probability — the property test
    pins hashed ≡ string results on fixtures). Stage 2 deliberately
    avoids a ``Window.partitionBy(key)``: a window partition is ONE
    task holding every occurrence of one shingle sorted, and shingle
    frequency is exactly what this operator hunts — a boilerplate
    8-gram occurring 10⁷–10⁸ times in a web corpus would become a
    single straggler task. ``count`` and ``min(struct)`` are both
    partial-aggregable, so map-side combine absorbs the hot key
    before the exchange, and the join back is a plain equi-join AQE's
    skew handling can split — no single-task hot partition anywhere.
    (``tests/test_properties.py`` pins the agg shape ≡ a window
    reference implementation, hashed × string, on random corpora.)
    """
    shingle = F.expr(
        f"transform(sequence(1, size({tokens_col}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {k})))"
    )
    occ = (
        df.filter(F.size(tokens_col) >= k)
        .select(F.col(id_col), F.posexplode(shingle).alias("pos", "__s"))
    )
    key = F.xxhash64("__s") if hash_shingles else F.col("__s")
    occ = occ.select(id_col, "pos", key.alias("__key"))
    repeated = (
        occ.groupBy("__key")
        .agg(
            F.count("*").alias("__c"),
            F.min(F.struct(id_col, "pos")).alias("__canon"),
        )
        .filter(F.col("__c") > 1)
        .select("__key", "__canon")
    )
    dup = (
        occ.join(repeated, "__key")
        .filter(
            (F.col(id_col) != F.col("__canon")[id_col])
            | (F.col("pos") != F.col("__canon")["pos"])
        )
        .select(id_col, "pos")
    )
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        dup.withColumn(
            "__new",
            F.when(
                prev_end.isNull() | (F.col("pos") > prev_end), 1
            ).otherwise(0),
        )
        .withColumn(
            "__island",
            F.sum("__new").over(
                w_doc.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return islands.groupBy(id_col, "__island").agg(
        F.min("pos").cast("long").alias("span_start"),
        F.max(F.col("pos") + k).cast("long").alias("span_end"),
    ).select(id_col, "span_start", "span_end")


def duplicate_span_stats(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    k: int = 8,
    hash_shingles: bool = False,
) -> DataFrame:
    """Per-document rollup of :func:`duplicate_spans`:
    ``(id, total_tokens, n_dup_spans, dup_tokens)`` — every input
    document appears (zero spans → zeros), so the frame doubles as
    the removal budget report a curation run logs. The final join is
    id-keyed and the span side is already id-partitioned."""
    spans = duplicate_spans(df, tokens_col, id_col, k, hash_shingles)
    stats = spans.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum(F.col("span_end") - F.col("span_start"))
        .cast("long")
        .alias("dup_tokens"),
    )
    totals = df.select(
        id_col, F.size(tokens_col).cast("long").alias("total_tokens")
    )
    return (
        totals.join(stats, on=id_col, how="left")
        .fillna(0, subset=["n_dup_spans", "dup_tokens"])
    )


def remove_duplicate_spans(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    k: int = 8,
    hash_shingles: bool = False,
    out_col: str = "tokens_clean",
) -> DataFrame:
    """The REMOVAL step of the ExactSubstr ladder: drop every token
    covered by a duplicate span (keep-one semantics — canonical
    copies survive untouched), returning the input plus ``out_col``
    (the cleaned token array). This is what a curation run actually
    writes out; :func:`duplicate_span_stats` is its budget report.

    Shape: the span frame groups to one bounded array per affected
    document (spans per doc ≈ repeated-passage count, small by
    construction), left-joins back on the id (co-partitioned with the
    span agg), and the cut itself is one JVM-side ``filter`` lambda
    with the element index probed against the span array via
    ``exists`` — no Python, no explode, no second pass over the
    corpus."""
    spans = duplicate_spans(df, tokens_col, id_col, k, hash_shingles)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("__spans")
    )
    joined = df.join(per_doc, on=id_col, how="left")
    covered = lambda x, i: F.exists(
        "__spans",
        lambda s: (i >= s["span_start"]) & (i < s["span_end"]),
    )
    cleaned = F.when(
        F.col("__spans").isNull(), F.col(tokens_col)
    ).otherwise(F.filter(tokens_col, lambda x, i: ~covered(x, i)))
    return joined.withColumn(out_col, cleaned).drop("__spans")


# -- tier 6: semantic dedup (SemDeDup) --------------------------------------


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_clusters: int | None = None,
    threshold: float = 0.45,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster the
    embedding space with seeded k-means, then within each cluster keep
    ONE representative per cosine epsilon-ball — greedy in ascending
    id order, so a document is dropped iff an earlier KEPT clustermate
    has cosine > ``threshold``. Returns ``(id, cluster, keep)``.

    This is the scale path past the exact pairwise tiers: the O(n²)
    similarity matrix becomes Σ O(|cluster|²). The cluster-count
    discipline is OPERATIONAL (VERDICT r09 item 3), not advisory:

    - ``n_clusters=None`` (the default) scales the cell count with the
      input — ``max(1, isqrt(n))``, the paper's ~√n regime (50k cells
      on LAION) — so average per-cluster greedy work is O(√n) and the
      total is O(n^1.5) worst-case, O(n) typical, whatever the corpus
      grows to. Costs one column-pruned count() before seeding.
    - ``max_cluster_size`` adds a straggler guard: cells the Lloyd
      assignment left larger than the bound get ONE refinement pass —
      re-clustered together with ``2·ceil(size/bound)`` finer seeded
      cells (locality-preserving, unlike a hash split) and remapped to
      fresh cluster ids. A cell still oversized after the pass is
      accepted (identical-vector pileups are irreducible by k-means —
      and also greedy-CHEAP: the kept set stays size 1, so the sweep
      is O(size), not O(size²); the quadratic straggler needs many
      pairwise-dissimilar vectors, exactly what the refinement
      separates).

    Plan shape: one map-only GEMM per Arrow batch for assignment
    (``similarity.kmeans_assign``), one (cell, dim) agg for the Lloyd
    step, then ONE shuffle on the cluster key into ``applyInPandas``
    where the greedy sweep vectorizes as kept-matrix @ candidate dot
    products. Determinism is total (seeded centroids, id order, no
    RNG — the refinement pass re-seeds by id within the oversized
    subset).

    ``id_col`` may be integral (carried as ``long``, the original
    contract) or string (carried natively — the Arrow schemas derive
    from the input type, so web-crawl corpora keyed by URL/hash need
    no surrogate join; VERDICT r10 item 6). Greedy order for string
    keys is lexicographic ascending — deterministic, same convention.
    Any other id type raises a clear ValueError up front rather than
    an Arrow conversion error three stages in (ADVICE r09).

    Output contract (pinned by the property test against an
    independent per-cluster numpy reference): within a cluster, kept
    rows are pairwise ≤ threshold, and every dropped row has an
    earlier kept witness > threshold — which uniquely determines the
    keep set given the assignment (ANY assignment is valid SemDeDup;
    the refinement pass only changes which docs are compared).
    """
    import math

    from pyspark.sql import types as T

    from .similarity import kmeans_assign

    id_type = df.schema[id_col].dataType
    if isinstance(
        id_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        id_expr, id_sql = F.col(id_col).cast("long"), "long"
    elif isinstance(id_type, T.StringType):
        id_expr, id_sql = F.col(id_col), "string"
    else:
        raise ValueError(
            f"semantic_dedup: id_col {id_col!r} must be integral or "
            f"string (got {id_type.simpleString()})"
        )

    vectors = df.select(id_expr.alias("nid"), F.col(vec_col).alias("vec"))
    if n_clusters is None:
        n_clusters = max(1, math.isqrt(vectors.count()))
    assigned, _ = kmeans_assign(vectors, n_clusters)
    if assigned is None:
        return df.sparkSession.createDataFrame(
            [], f"{id_col} {id_sql}, cluster long, keep boolean"
        )

    if max_cluster_size is not None:
        # The guard's driver-side actions (sizes collect, the
        # oversized count, the refinement's seed collect + Lloyd agg)
        # would each replay the corpus-wide assignment GEMM — persist
        # it for the guard's lifetime, release before returning (the
        # final lazy plan recomputes the map stage once at action
        # time; pinning it for the caller's whole session is the
        # ADVICE-r09 cache-leak anti-pattern).
        from pyspark import StorageLevel

        pinned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            assigned = pinned
            sizes = assigned.groupBy("cell").count()
            big = sorted(
                r["cell"]
                for r in sizes.filter(
                    F.col("count") > max_cluster_size
                ).collect()  # ≤ n_clusters ids — metadata, never data
            )
            if big:
                over = assigned.filter(F.col("cell").isin(big))
                rest = assigned.filter(~F.col("cell").isin(big))
                n_over = over.count()
                k2 = 2 * math.ceil(n_over / max_cluster_size)
                sub, _ = kmeans_assign(over.select("nid", "vec"), k2)
                assigned = rest.unionByName(
                    sub.select(
                        "nid",
                        "vec",
                        (F.lit(n_clusters) + F.col("cell")).alias("cell"),
                    )
                )
        finally:
            pinned.unpersist()


    thr = float(threshold)

    def greedy(pdf):
        # Self-contained closure (cloudpickle ships by value; workers
        # cannot import this package — see minhash note above).
        import numpy as _np
        import pandas as _pd

        pdf = pdf.sort_values("nid").reset_index(drop=True)
        V = _np.array(pdf["vec"].tolist(), dtype=_np.float64)
        n = len(pdf)
        norms = _np.linalg.norm(V, axis=1)
        Vn = V / _np.where(norms == 0.0, 1.0, norms)[:, None]
        keep = _np.zeros(n, dtype=bool)
        kept: list[int] = []
        for i in range(n):
            if kept and (Vn[kept] @ Vn[i] > thr).any():
                continue
            keep[i] = True
            kept.append(i)
        return _pd.DataFrame(
            {"nid": pdf["nid"], "cell": pdf["cell"], "keep": keep}
        )

    return (
        assigned.groupBy("cell")
        .applyInPandas(greedy, f"nid {id_sql}, cell long, keep boolean")
        .select(
            F.col("nid").alias(id_col),
            F.col("cell").alias("cluster"),
            "keep",
        )
    )
