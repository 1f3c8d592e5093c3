"""Property-based tests (SURVEY §5): algebraic invariants that must
hold for ANY input, checked over hypothesis-generated frames.

Spark jobs are slow per-example, so examples are few but adversarial
(empty frames, dup-heavy data, unicode-ish strings, nulls).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

row = st.tuples(
    st.integers(min_value=-5, max_value=5),
    st.one_of(st.none(), st.text(alphabet="ab '\"\\", max_size=4)),
)
rows = st.lists(row, max_size=12)


def _df(spark, data):
    return spark.createDataFrame(data, "k int, v string")


@SETTINGS
@given(data=rows)
def test_dedup_idempotent(spark, data):
    """dropDuplicates twice == once, and output has no dup rows."""
    df = _df(spark, data)
    once = df.dropDuplicates()
    twice = once.dropDuplicates()
    a = sorted(map(repr, map(tuple, once.collect())))
    b = sorted(map(repr, map(tuple, twice.collect())))
    assert a == b
    assert len(a) == len(set(a))
    assert set(a) == set(map(repr, map(tuple, df.collect())))


@SETTINGS
@given(x=rows, y=rows, z=rows)
def test_union_associative_and_counting(spark, x, y, z):
    """(x∪y)∪z == x∪(y∪z) as multisets; sizes add."""
    dx, dy, dz = _df(spark, x), _df(spark, y), _df(spark, z)
    left = dx.unionByName(dy).unionByName(dz)
    right = dx.unionByName(dy.unionByName(dz))
    la = sorted(map(repr, map(tuple, left.collect())))
    ra = sorted(map(repr, map(tuple, right.collect())))
    assert la == ra
    assert len(la) == len(x) + len(y) + len(z)


@SETTINGS
@given(data=rows)
def test_rename_reorder_invariance(spark, data):
    """Renaming then reordering columns never changes row content
    (the reference's rename+reorder steps, src/etl.py:201-207)."""
    df = _df(spark, data)
    out = df.withColumnsRenamed({"k": "key", "v": "val"}).select("val", "key")
    orig = sorted(repr((r.v, r.k)) for r in df.collect())
    after = sorted(repr((r.val, r.key)) for r in out.collect())
    assert orig == after


@SETTINGS
@given(data=rows)
def test_filter_partition_complement(spark, data):
    """A predicate and its null-safe complement partition the frame."""
    df = _df(spark, data)
    pred = F.col("v").isNotNull() & (F.col("v") != "")
    n_yes = df.filter(pred).count()
    n_no = df.filter(~pred | F.col("v").isNull()).count()
    assert n_yes + n_no == len(data)


@SETTINGS
@given(data=st.lists(st.text(alphabet="abc xy.", max_size=20), max_size=8))
def test_jaccard_strategies_agree(spark, data):
    """MinHash+verify and inverted-index Jaccard agree on ANY corpus
    (not just the fixtures)."""
    from turnover_odata_etl_spark.operators.dedup import (
        near_dup_pairs,
        ngram_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(data)], "doc_id long, text string"
    )
    via_minhash = {
        (r.a_id, r.b_id, r.jac)
        for r in near_dup_pairs(docs, "text", "doc_id", 0.5).collect()
    }
    via_index = {
        (r.a_id, r.b_id, r.jac)
        for r in ngram_jaccard_pairs(docs, "text", "doc_id", 0.5).collect()
    }
    assert via_minhash == via_index


@SETTINGS
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),       # user
            st.integers(min_value=0, max_value=10_000),  # ms offset
        ),
        max_size=15,
    )
)
def test_sessionize_gap_invariants(spark, data):
    """For ANY event set: within a session every inter-event gap is
    <= the threshold; across consecutive sessions the gap is > it;
    sessions partition the input rows exactly."""
    from turnover_odata_etl_spark.operators.sessionize import sessionize

    gap = 1000
    rows = [
        (i, u, ms * 1_000_000)  # micros epoch
        for i, (u, ms) in enumerate(data)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    df = df.withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    out = sessionize(df, "user_id", "ts", gap, order_cols=("event_id",)).collect()
    assert len(out) == len(rows)
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: (r.ms, r.event_id))
        for prev, cur in zip(rs, rs[1:]):
            delta = cur.ms - prev.ms
            if cur.session_id == prev.session_id:
                assert delta <= gap
            else:
                assert cur.session_id == prev.session_id + 1
                assert delta > gap


def test_events_nanos_truncation_matches_duckdb(spark, oracle_con, sf_dir):
    """Cross-engine timestamp contract: our nanos→micros conversion
    (integer `ts div 1000` in tables.load_table) must agree with
    DuckDB's read of the same TIMESTAMP(NANOS) parquet at microsecond
    precision for EVERY row — guards rounding/precision drift (float
    division would corrupt the low bits: epoch-nanos > 2^53)."""
    from turnover_odata_etl_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").selectExpr(
        "event_id", "unix_micros(cast(ts as timestamp)) AS us"
    )
    spark_us = {r.event_id: r.us for r in ev.collect()}
    oracle = oracle_con.sql(
        "SELECT event_id, epoch_us(ts) AS us FROM events"
    ).fetchall()
    assert len(oracle) == len(spark_us)
    mismatches = [(i, u, spark_us[i]) for i, u in oracle if spark_us[i] != u]
    assert not mismatches, f"first diffs: {mismatches[:5]}"


@SETTINGS
@given(
    dims=st.tuples(
        st.integers(min_value=1, max_value=23),
        st.integers(min_value=1, max_value=19),
    ),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_image_codec_roundtrip_any_size(dims, seed):
    """decode_image(encode_ppm(img)) == img for arbitrary image sizes
    and contents, and resize_nearest is idempotent at the same size."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        decode_image,
        encode_ppm,
        resize_nearest,
    )

    w, h = dims
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert np.array_equal(decode_image(encode_ppm(img)), img)
    assert np.array_equal(resize_nearest(img, w, h), img)
    small = resize_nearest(img, min(w, 4), min(h, 4))
    assert small.shape == (min(h, 4), min(w, 4), 3)


@SETTINGS
@given(
    toks=st.lists(st.integers(min_value=1, max_value=700), max_size=16),
    budget=st.sampled_from([4, 64, 512]),
)
def test_sequence_pack_invariants(spark, toks, budget):
    """Packing invariants for ANY token-count multiset: fragments of a
    doc sum to its token count; every sequence except a shard's last is
    filled to exactly the budget; offsets+lengths tile each sequence
    without overlap."""
    import itertools

    from pyspark.sql import Window

    if not toks:
        return
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(toks)], "doc_id long, n_tok long"
    )
    B = budget
    w = (
        Window.partitionBy(F.lit(0))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = df.withColumn("cum", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    frags = c.withColumn(
        "seq_no",
        F.explode(
            F.sequence(F.expr(f"cum div {B}"), F.expr(f"(cum + n_tok - 1) div {B}"))
        ),
    )
    start = F.greatest(F.col("cum"), F.col("seq_no") * B)
    end = F.least(F.col("cum") + F.col("n_tok"), (F.col("seq_no") + 1) * B)
    out = frags.select(
        "doc_id",
        "seq_no",
        (start - F.col("seq_no") * B).alias("off"),
        (end - start).alias("ln"),
    ).collect()
    # per-doc fragment lengths sum to n_tok
    per_doc: dict[int, int] = {}
    for r in out:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + r.ln
    assert per_doc == {i: n for i, n in enumerate(toks)}
    # sequences tile exactly: fragments in a seq are disjoint and
    # contiguous from 0; all but the last seq sum to the full budget
    by_seq: dict[int, list] = {}
    for r in out:
        by_seq.setdefault(r.seq_no, []).append((r.off, r.ln))
    last_seq = max(by_seq)
    for seq_no, pieces in by_seq.items():
        pieces.sort()
        pos = 0
        for off, ln in pieces:
            assert off == pos, (seq_no, pieces)
            pos += ln
        if seq_no != last_seq:
            assert pos == B, (seq_no, pos)
        assert pos <= B


@SETTINGS
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=12
        ).map(lambda ws: " ".join(ws)),
        max_size=10,
    )
)
def test_decontamination_invariants(spark, texts):
    """For ANY corpus: eval docs never survive; a doc sharing an
    8-gram with any eval doc is dropped; short docs (<8 tokens)
    always survive."""
    rows = [(i, t) for i, t in enumerate(texts)]
    if not rows:
        return
    from turnover_odata_etl_spark.functions import text as TXT

    df = spark.createDataFrame(rows, "doc_id long, text string")
    df = df.withColumn("tk", TXT.tokens(F.col("text")))
    sh = df.select(
        "doc_id",
        F.when(
            F.size("tk") >= 8,
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, size(tk) - 7),"
                    " i -> concat_ws(' ', slice(tk, i, 8)))"
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("shingles"),
    )
    is_eval = F.col("doc_id") % 3 == 0  # denser eval slice for tiny corpora
    eval_sh = sh.filter(is_eval).select(F.explode("shingles").alias("s")).distinct()
    train = sh.filter(~is_eval)
    contaminated = (
        train.select("doc_id", F.explode("shingles").alias("s"))
        .join(F.broadcast(eval_sh), "s", "left_semi")
        .select("doc_id")
        .distinct()
    )
    clean = {
        r.doc_id
        for r in train.join(contaminated, "doc_id", "left_anti")
        .select("doc_id")
        .collect()
    }
    eval_set = {sid for sid, t in rows if sid % 3 == 0}
    ev_grams = set()
    for sid, t in rows:
        if sid in eval_set:
            ws = t.split()
            ev_grams |= {" ".join(ws[i : i + 8]) for i in range(len(ws) - 7)}
    for sid, t in rows:
        if sid in eval_set:
            assert sid not in clean
            continue
        ws = t.split()
        grams = {" ".join(ws[i : i + 8]) for i in range(len(ws) - 7)}
        expect_clean = not (grams & ev_grams)
        assert (sid in clean) == expect_clean, (sid, t)


# ---------------------------------------------------------------------------
# Codec fuzzing — pure numpy, no Spark. The fixed-case tests in
# test_llm.py cover each filter/color-type once; these drive random
# shapes through the same paths, including the degenerate geometries
# (w == 1 exercises the x < nch branch of Sub/Average/Paeth, h == 1
# exercises Up against the zero row) that fixed fixtures miss.
# ---------------------------------------------------------------------------
@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_png_roundtrip_random(data):
    """decode(encode(img)) == img for ANY 8-bit image and filter mix."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    h = data.draw(st.integers(1, 9), label="h")
    w = data.draw(st.integers(1, 9), label="w")
    nch = data.draw(st.sampled_from([1, 3, 4]), label="nch")
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=6), label="filters"
    )
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    img = np.random.default_rng(seed).integers(
        0, 256, size=(h, w, nch), dtype=np.uint8
    )
    decoded = _decode_png(encode_png(img, filters=filters))
    assert decoded.shape == (h, w, 3)
    if nch == 1:
        assert np.array_equal(decoded, np.repeat(img, 3, axis=2))
    else:  # RGB / RGBA-with-alpha-dropped
        assert np.array_equal(decoded, img[:, :, :3])


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_wav_roundtrip_random(data):
    """decode(encode(pcm)) == pcm for ANY int16 PCM block, any channel
    count, including odd-length payloads (RIFF pad byte path)."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    frames = data.draw(st.integers(1, 50), label="frames")
    nch = data.draw(st.integers(1, 4), label="nch")
    rate = data.draw(st.sampled_from([8000, 16000, 44100]), label="rate")
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    pcm = np.random.default_rng(seed).integers(
        -(2**15), 2**15, size=(frames, nch), dtype=np.int64
    ).astype(np.int16)
    out, out_rate = decode_wav(encode_wav(pcm, sample_rate=rate))
    assert out_rate == rate
    assert out.shape == (frames, nch)
    assert np.array_equal(out, pcm)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_prefix_filter_jaccard_exact_vs_bruteforce(spark, data):
    """prefix_filter_jaccard_pairs claims EXACT (no false negatives,
    no false positives) — check against an O(n²) Python brute force on
    random corpora, including thresholds where t·n is exactly integral
    (the ceil-ulp regression, ADVICE r04)."""
    from turnover_odata_etl_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    n_docs = data.draw(st.integers(2, 8), label="n_docs")
    docs = [
        (
            i,
            " ".join(
                data.draw(
                    st.lists(
                        st.sampled_from(vocab),
                        min_size=1,
                        max_size=6,
                        unique=True,
                    ),
                    label=f"doc{i}",
                )
            ),
        )
        for i in range(n_docs)
    ]
    threshold = data.draw(
        st.sampled_from([0.5, 0.6, 0.75, 0.8, 1.0]), label="t"
    )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.a_id, r.b_id)
        for r in prefix_filter_jaccard_pairs(
            df, "text", "doc_id", threshold=threshold
        ).collect()
    }
    sets = {i: set(t.split()) for i, t in docs}
    want = {
        (i, j)
        for i in sets
        for j in sets
        if i < j
        and len(sets[i] & sets[j]) / len(sets[i] | sets[j]) >= threshold
    }
    assert got == want, (docs, threshold, got, want)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_asof_join_matches_bruteforce(spark, data):
    """asof_join == per-row Python brute force (latest right with
    rts <= ts per key, tolerance honored) on random event sets with
    deliberately colliding timestamps. Right-side ts values are kept
    UNIQUE per key — two right rows at the same (key, ts) tie
    arbitrarily in both implementations, which is the documented
    nondeterminism, not a bug to test."""
    import datetime as dt

    from turnover_odata_etl_spark.operators.asof import asof_join

    base = dt.datetime(2024, 1, 1)
    n_left = data.draw(st.integers(1, 8), label="n_left")
    lefts = [
        (
            i,
            data.draw(st.sampled_from(["a", "b"]), label=f"lk{i}"),
            base + dt.timedelta(hours=data.draw(st.integers(0, 20), label=f"lt{i}")),
        )
        for i in range(n_left)
    ]
    r_hours = data.draw(
        st.lists(st.integers(0, 20), min_size=0, max_size=6, unique=True),
        label="r_hours",
    )
    rights = [
        (
            data.draw(st.sampled_from(["a", "b"]), label=f"rk{h}"),
            base + dt.timedelta(hours=h),
            float(h),
        )
        for h in r_hours
    ]
    tol = data.draw(st.sampled_from([None, 5 * 3600 * 1000]), label="tol")

    left = spark.createDataFrame(lefts, "id long, k string, ts timestamp")
    right = spark.createDataFrame(rights, "k string, rts timestamp, val double")
    out = {
        r.id: r.val
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="rts",
            tolerance_ms=tol,
        ).collect()
    }

    for i, k, ts in lefts:
        cands = [(rts, v) for rk, rts, v in rights if rk == k and rts <= ts]
        want = None
        if cands:
            rts, v = max(cands)
            if tol is None or (ts - rts).total_seconds() * 1000 <= tol:
                want = v
        assert out[i] == want, (i, k, ts, rights, tol, out)


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_bpe_train_matches_reference(spark, data):
    """bpe_train_merges == the textbook BPE trainer (explicit
    left-to-right merge application, count-desc/pair-asc tie-break)
    on random word dictionaries over a tiny alphabet — small alphabets
    force repeated-pair words ('aaaa') and count ties, the two spots
    where the wrapped-token replace() encoding could diverge from the
    sequential reference."""
    from collections import Counter

    from turnover_odata_etl_spark.functions.text import bpe_train_merges

    n_words = data.draw(st.integers(2, 8), label="n_words")
    words = data.draw(
        st.lists(
            st.text(alphabet="ab", min_size=2, max_size=6),
            min_size=n_words,
            max_size=n_words,
            unique=True,
        ),
        label="words",
    )
    counts = [
        data.draw(st.integers(1, 9), label=f"cnt{i}")
        for i in range(len(words))
    ]
    k = data.draw(st.integers(1, 4), label="k")

    # Reference: sequential merge application per word.
    seqs = [(list(w), c) for w, c in zip(words, counts)]
    want = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for toks, c in seqs:
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        want.append((rank, best[0], best[1], pc[best]))
        new = []
        for toks, c in seqs:
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append((out, c))
        seqs = new

    df = spark.createDataFrame(
        list(zip(words, counts)), "word string, cnt long"
    )
    got = bpe_train_merges(df, k)
    assert got == want, (words, counts, k, got, want)


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_png_palette_and_16bit_roundtrip_random(data):
    """The round-5 variant extensions: paletted (PLTE lookup) decodes
    to palette[idx] exactly; 16-bit decodes to the high byte exactly —
    for ANY geometry, palette size, and filter mix."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    h = data.draw(st.integers(1, 9), label="h")
    w = data.draw(st.integers(1, 9), label="w")
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=6), label="filters"
    )
    seed = data.draw(st.integers(0, 2**31 - 1), label="seed")
    rng = np.random.default_rng(seed)

    variant = data.draw(
        st.sampled_from(["palette", "rgb16", "gray16"]), label="variant"
    )
    if variant == "palette":
        n = data.draw(st.integers(1, 256), label="n_colors")
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
        decoded = _decode_png(encode_png(idx, filters=filters, palette=pal))
        assert np.array_equal(decoded, pal[idx])
    elif variant == "rgb16":
        img = rng.integers(0, 65536, size=(h, w, 3), dtype=np.uint16)
        decoded = _decode_png(encode_png(img, filters=filters, depth=16))
        assert np.array_equal(decoded, (img >> 8).astype(np.uint8))
    else:
        img = rng.integers(0, 65536, size=(h, w), dtype=np.uint16)
        decoded = _decode_png(encode_png(img, filters=filters, depth=16))
        expect = np.repeat(((img >> 8).astype(np.uint8))[:, :, None], 3, axis=2)
        assert np.array_equal(decoded, expect)


def test_png_variant_errors_are_loud():
    """Missing PLTE, out-of-range palette index, and spec-invalid
    depth/color combinations raise ValueError — never a silent wrong
    decode."""
    import struct

    import numpy as np
    import pytest

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    pal = np.arange(30, dtype=np.uint8).reshape(10, 3)
    idx = np.zeros((4, 4), dtype=np.uint8)

    blob = bytearray(encode_png(idx, palette=pal))
    i = blob.find(b"PLTE") - 4
    (ln,) = struct.unpack_from(">I", blob, i)
    del blob[i : i + 12 + ln]
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png(bytes(blob))

    with pytest.raises(ValueError, match="index out of range"):
        encode_png(np.full((2, 2), 99, dtype=np.uint8), palette=pal)

    blob = bytearray(encode_png(np.zeros((2, 2, 3), dtype=np.uint16), depth=16))
    i = blob.find(b"IHDR")
    # depth byte → 4 on an RGB image: sub-byte depths are only legal
    # for gray/paletted per the spec, so this must stay a loud error
    blob[i + 12] = 4
    with pytest.raises(ValueError, match="unsupported"):
        _decode_png(bytes(blob))


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_bpe_heap_encoder_matches_replace_convention(data):
    """The production heap-tier encoder (make_bpe_word_encoder) must be
    BIT-IDENTICAL to the rank-ordered literal-replace convention the
    cross-engine oracles replay — at deep K (the textbook trainer is
    run for up to 40 rounds; small alphabets force repeated-pair words
    and overlapping occurrences, the spots where heap order could
    diverge from left-to-right replace). Mirrors the trainer\'s own
    K=40 pin; the equivalence argument lives in the factory docstring
    and REQUIRES trained tables, which is exactly what this generates.
    """
    from collections import Counter

    from turnover_odata_etl_spark.functions.text import (
        make_bpe_word_encoder,
    )

    alphabet = data.draw(st.sampled_from(["ab", "abc"]), label="alphabet")
    n_words = data.draw(st.integers(3, 10), label="n_words")
    words = data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=9),
            min_size=n_words,
            max_size=n_words,
            unique=True,
        ),
        label="words",
    )
    counts = [
        data.draw(st.integers(1, 9), label=f"cnt{i}")
        for i in range(len(words))
    ]
    k = data.draw(st.integers(1, 40), label="k")

    # Textbook sequential trainer (same reference as the trainer pins).
    seqs = [(list(w), c) for w, c in zip(words, counts)]
    merges = []
    for _rank in range(1, k + 1):
        pc: Counter = Counter()
        for toks, c in seqs:
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        merges.append(best)
        new = []
        for toks, c in seqs:
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append((out, c))
        seqs = new

    # Encode BOTH trained words and unseen words from the same
    # alphabet (a tokenizer service sees out-of-dictionary words).
    probe = words + data.draw(
        st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=12),
            min_size=0,
            max_size=6,
        ),
        label="probe",
    )
    encode_word = make_bpe_word_encoder(merges, cache_size=4)

    for w in probe:
        # Replace-tier reference: the exact _make_bpe_encoder
        # convention, per word.
        s = "(" + ")(".join(w) + ")"
        for p1, p2 in merges:
            s = s.replace(f"({p1})({p2})", f"({p1}{p2})")
        want = tuple(s[1:-1].split(")("))
        got = encode_word(w)
        assert got == want, (w, merges, got, want)
        # Cache hit (and post-eviction recompute) must be identical.
        assert encode_word(w) == want


def test_bpe_train_deep_k_with_checkpoints_matches_reference(spark):
    """The lineage-depth guard (localCheckpoint every C rounds) must be
    bit-identical to the unguarded trainer: K=40 merges over a fixed
    dictionary with checkpoint_every=8 (five checkpoints fire) vs the
    sequential textbook trainer. Also bounds the cost: a deep-K run
    must not blow up in plan-rebuild time (the O(K²) re-execution the
    guard exists to cut)."""
    from collections import Counter

    from turnover_odata_etl_spark.functions.text import bpe_train_merges

    words = [
        "abababab", "bababa", "aabbaabb", "abcabcabc", "cccab",
        "babc", "aaaa", "bbbb", "abba", "caab", "acbca", "bacab",
    ]
    counts = [9, 7, 6, 5, 5, 4, 4, 3, 3, 2, 2, 1]
    k = 40

    seqs = [(list(w), c) for w, c in zip(words, counts)]
    want = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for toks, c in seqs:
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        best = min(pc, key=lambda p: (-pc[p], p))
        want.append((rank, best[0], best[1], pc[best]))
        new = []
        for toks, c in seqs:
            out, i = [], 0
            while i < len(toks):
                if (
                    i + 1 < len(toks)
                    and toks[i] == best[0]
                    and toks[i + 1] == best[1]
                ):
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append((out, c))
        seqs = new

    df = spark.createDataFrame(
        list(zip(words, counts)), "word string, cnt long"
    )
    got = bpe_train_merges(df, k, checkpoint_every=8)
    assert got == want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_hamming_neardup_pairs_exact_vs_bruteforce(spark, data):
    """The banding engine shared by the SimHash and perceptual-hash
    tiers must be EXACT at radius ≤ 3: random 64-bit signatures plus
    planted ≤3-bit-flip near-dups, banding result == O(n²) brute
    force. Randomness probes band boundaries (a planted flip landing
    on a 16-bit band edge is the spot a wrong band slice would
    miss)."""
    from turnover_odata_etl_spark.operators.dedup import (
        hamming_neardup_pairs,
    )

    n = data.draw(st.integers(5, 12), label="n_base")
    sigs = [
        data.draw(st.integers(0, 2**64 - 1), label=f"sig{i}")
        for i in range(n)
    ]
    # Plant near-dups: flip ≤ 3 random bits of random base signatures.
    n_planted = data.draw(st.integers(1, 4), label="n_planted")
    for _ in range(n_planted):
        base = sigs[data.draw(st.integers(0, n - 1), label="base_idx")]
        k = data.draw(st.integers(0, 3), label="n_flips")
        for _ in range(k):
            base ^= 1 << data.draw(st.integers(0, 63), label="bit")
        sigs.append(base)

    rows = [
        (
            i,
            s - (1 << 64) if s >= (1 << 63) else s,
            [(s >> (16 * b)) & 0xFFFF for b in range(4)],
        )
        for i, s in enumerate(sigs)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, sig long, bands array<long>"
    )
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in hamming_neardup_pairs(df, max_hamming=3).collect()
    }
    want = {
        (i, j, bin(sigs[i] ^ sigs[j]).count("1"))
        for i in range(len(sigs))
        for j in range(i + 1, len(sigs))
        if bin(sigs[i] ^ sigs[j]).count("1") <= 3
    }
    assert got == want


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_png_adam7_roundtrip_random(data):
    """Adam7 interlace (round 6 — the last real-world PNG layout
    corner): encode interlaced, decode, pixels bit-identical to the
    sequential encoding of the same image — for ANY geometry
    (including w or h < 8, where some of the seven passes are EMPTY
    and must contribute zero bytes), any variant (gray/RGB/RGBA,
    paletted, 16-bit), and a random per-row filter cycle (the filter
    state must reset per PASS, not run through)."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    w = data.draw(st.integers(1, 21), label="w")
    h = data.draw(st.integers(1, 21), label="h")
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=5),
        label="filters",
    )
    variant = data.draw(
        st.sampled_from(["gray", "rgb", "rgba", "palette", "u16"]),
        label="variant",
    )
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))

    if variant == "palette":
        n_pal = data.draw(st.integers(1, 17), label="n_pal")
        pal = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
        idx = rng.integers(0, n_pal, size=(h, w)).astype(np.uint8)
        seq = encode_png(idx, filters, palette=pal)
        inter = encode_png(idx, filters, palette=pal, interlace=True)
    elif variant == "u16":
        nch = data.draw(st.sampled_from([1, 3]), label="nch16")
        shape = (h, w) if nch == 1 else (h, w, nch)
        img = rng.integers(0, 65536, size=shape, dtype=np.uint16)
        seq = encode_png(img, filters, depth=16)
        inter = encode_png(img, filters, depth=16, interlace=True)
    else:
        nch = {"gray": 1, "rgb": 3, "rgba": 4}[variant]
        img = rng.integers(0, 256, size=(h, w, nch), dtype=np.uint8)
        seq = encode_png(img, filters)
        inter = encode_png(img, filters, interlace=True)

    a = _decode_png(seq)
    b = _decode_png(inter)
    assert a.shape == b.shape == (h, w, 3)
    assert (a == b).all()


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_png_sub_byte_roundtrip_random(data):
    """Sub-byte depths (1/2/4-bit gray and paletted — the only color
    types the spec allows below 8 bits): encode → decode is exact for
    ANY geometry (widths that don't fill the last byte exercise the
    padding), filter cycle, and BOTH layouts — sequential and Adam7
    (where each pass packs bits within its own rows)."""
    import numpy as np

    from turnover_odata_etl_spark.functions.multimodal import (
        _decode_png,
        encode_png,
    )

    w = data.draw(st.integers(1, 19), label="w")
    h = data.draw(st.integers(1, 19), label="h")
    depth = data.draw(st.sampled_from([1, 2, 4]), label="depth")
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=1, max_size=5),
        label="filters",
    )
    paletted = data.draw(st.booleans(), label="paletted")
    interlace = data.draw(st.booleans(), label="interlace")
    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))

    vals = rng.integers(0, 1 << depth, size=(h, w), dtype=np.uint8)
    if paletted:
        pal = rng.integers(0, 256, size=(1 << depth, 3), dtype=np.uint8)
        blob = encode_png(
            vals, filters, palette=pal, depth=depth, interlace=interlace
        )
        want = pal[vals]
    else:
        blob = encode_png(vals, filters, depth=depth, interlace=interlace)
        scale = 255 // ((1 << depth) - 1)
        want = np.repeat(
            (vals * scale).astype(np.uint8)[:, :, None], 3, axis=2
        )
    got = _decode_png(blob)
    assert got.shape == (h, w, 3)
    assert (got == want).all()


@SETTINGS
@given(data=st.data())
def test_duplicate_spans_agg_equals_window_reference(spark, data):
    """The de-skewed stage 2 of ``duplicate_spans`` (groupBy
    ``(count, min(struct(id, pos)))`` + join-back — VERDICT r07 item
    2) must be bit-identical to the window formulation it replaced
    (``row_number() over (partition by key order by id, pos) > 1``),
    for ANY corpus, at BOTH key representations (exact string and
    xxhash64). The reference lives here so the hot-shingle-safe
    production shape is pinned against an independent implementation,
    not against itself."""
    from pyspark.sql import Window

    from turnover_odata_etl_spark.operators.dedup import duplicate_spans

    k = data.draw(st.integers(2, 4), label="k")
    # tiny alphabet → heavy shingle repetition (the operator's prey)
    docs = data.draw(
        st.lists(
            st.lists(
                st.sampled_from("a b c".split()), min_size=0, max_size=12
            ),
            min_size=0,
            max_size=6,
        ),
        label="docs",
    )
    hashed = data.draw(st.booleans(), label="hashed")
    df = spark.createDataFrame(
        [(i, tk) for i, tk in enumerate(docs)],
        "doc_id long, tk array<string>",
    )

    got = sorted(
        map(
            tuple,
            duplicate_spans(
                df, "tk", "doc_id", k=k, hash_shingles=hashed
            ).collect(),
        )
    )

    # independent window-based reference: flag every non-canonical
    # occurrence, then merge to maximal spans in plain Python
    shingle = F.expr(
        f"transform(sequence(1, size(tk) - {k - 1}),"
        f" i -> concat_ws(' ', slice(tk, i, {k})))"
    )
    occ = df.filter(F.size("tk") >= k).select(
        "doc_id", F.posexplode(shingle).alias("pos", "__key")
    )
    w_all = Window.partitionBy("__key")
    w_ord = Window.partitionBy("__key").orderBy("doc_id", "pos")
    flagged = (
        occ.withColumn("__c", F.count("*").over(w_all))
        .withColumn("__rn", F.row_number().over(w_ord))
        .filter((F.col("__c") > 1) & (F.col("__rn") > 1))
        .select("doc_id", "pos")
        .collect()
    )
    by_doc: dict[int, list[int]] = {}
    for r in flagged:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    want = []
    for doc_id, positions in by_doc.items():
        positions.sort()
        start = end = None
        for p in positions:
            if start is None:
                start, end = p, p + k
            elif p <= end:  # overlap or adjacency
                end = max(end, p + k)
            else:
                want.append((doc_id, start, end))
                start, end = p, p + k
        if start is not None:
            want.append((doc_id, start, end))
    assert got == sorted(want)


@SETTINGS
@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(alphabet="ab .", max_size=6)),
        min_size=0,
        max_size=12,
    )
)
def test_fingerprint_dedup_null_safe_keeps_every_row(spark, texts):
    """``fingerprint_dedup`` must retain EVERY input row — including
    rows whose text (hence fingerprint) is NULL — and its keep flags
    must equal the window formulation the groupBy+join-back de-skew
    replaced (``row_number() over (partition by fingerprint order by
    id) == 1``; SQL windows put all NULLs in ONE partition). ADVICE
    r08: the de-skew's plain equi-join dropped NULL-fingerprint rows
    (NULL != NULL); the eqNullSafe join restores the contract. This
    pins it for any corpus, null-heavy included."""
    from pyspark.sql import Window

    from turnover_odata_etl_spark.operators.dedup import fingerprint_dedup
    from turnover_odata_etl_spark.functions.text import fingerprint

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["doc_id"], r["keep"])
        for r in fingerprint_dedup(df, "text", "doc_id").collect()
    }
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    want = {
        (r["doc_id"], r["keep"])
        for r in df.withColumn("fingerprint", fingerprint("text"))
        .withColumn("keep", F.row_number().over(w) == 1)
        .collect()
    }
    assert got == want
    assert len(got) == len(texts)  # no silent row loss


@SETTINGS
@given(data=st.data())
def test_semantic_dedup_matches_percluster_greedy_reference(spark, data):
    """``semantic_dedup``'s keep set, GIVEN its own cluster
    assignment, must equal an independent numpy greedy sweep per
    cluster (ascending id; drop iff an earlier KEPT clustermate's
    cosine > threshold). The reference takes the operator's (id,
    cluster) output as input — clustering quality is not under test
    here (any assignment is valid SemDeDup), the keep semantics are.
    Also pins: every input row appears exactly once, and within a
    cluster kept rows are pairwise ≤ threshold (the uniqueness
    invariant).

    r11: ids are drawn long OR string (the lifted restriction,
    VERDICT r10 item 6) — unpadded string keys ("d0", "d1", … "d13")
    deliberately make lexicographic order diverge from numeric order
    past n=10, so the test pins that BOTH sides use the same
    (lexicographic) greedy convention for string keys."""
    import numpy as np

    from turnover_odata_etl_spark.operators.dedup import semantic_dedup

    dim = data.draw(st.integers(2, 4), label="dim")
    n = data.draw(st.integers(0, 14), label="n")
    str_keys = data.draw(st.booleans(), label="str_keys")
    thr = data.draw(st.sampled_from([0.3, 0.7, 0.95]), label="thr")
    # n_clusters=None exercises the sqrt(n) default; max_cluster_size
    # exercises the refinement-pass straggler guard (VERDICT r09
    # item 3) — the reference below reads the operator's own final
    # assignment, so EVERY guard-induced re-assignment stays covered.
    k = data.draw(st.sampled_from([None, 1, 2, 3, 4]), label="k")
    mcs = data.draw(st.sampled_from([None, 2, 4]), label="mcs")
    # small integer grid → plenty of exact duplicates and near-dups
    vecs = [
        data.draw(
            st.lists(
                st.integers(-2, 2).map(float), min_size=dim, max_size=dim
            ),
            label=f"v{i}",
        )
        for i in range(n)
    ]
    if str_keys:
        keys = [f"d{i}" for i in range(n)]
        id_schema, to_idx = "vec_id string", lambda s: int(s[1:])
    else:
        keys = list(range(n))
        id_schema, to_idx = "vec_id long", lambda i: i
    df = spark.createDataFrame(
        [(keys[i], v) for i, v in enumerate(vecs)],
        f"{id_schema}, embedding array<float>",
    )
    out = semantic_dedup(
        df, "vec_id", "embedding", n_clusters=k, threshold=thr,
        max_cluster_size=mcs,
    ).collect()
    assert sorted(r["vec_id"] for r in out) == sorted(keys)

    # reference iterates each cluster in the SAME ascending-key order
    # the operator greedy uses (numeric for long, lexicographic for
    # string), then maps keys back to vector rows
    by_cluster: dict[int, list[int]] = {}
    for r in sorted(out, key=lambda r: r["vec_id"]):
        by_cluster.setdefault(r["cluster"], []).append(
            to_idx(r["vec_id"])
        )
    got = {to_idx(r["vec_id"]): r["keep"] for r in out}

    V = np.array(vecs, dtype=np.float64) if n else np.zeros((0, dim))
    norms = np.linalg.norm(V, axis=1) if n else np.array([])
    Vn = V / np.where(norms == 0.0, 1.0, norms)[:, None] if n else V
    want = {}
    for ids in by_cluster.values():
        kept: list[int] = []
        for i in ids:  # ascending id (insertion order above)
            if kept and (Vn[kept] @ Vn[i] > thr).any():
                want[i] = False
            else:
                want[i] = True
                kept.append(i)
    assert got == want
    for ids in by_cluster.values():  # kept pairwise <= thr
        kept = [i for i in ids if got[i]]
        for a in range(len(kept)):
            for b in range(a + 1, len(kept)):
                assert Vn[kept[a]] @ Vn[kept[b]] <= thr + 1e-12
