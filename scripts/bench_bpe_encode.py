#!/usr/bin/env python3
"""A/B the two BPE encode tiers at a production-ish merge count.

The oracle tier (``plans/llm._make_bpe_encoder``) runs K sequential
whole-string ``str.replace`` passes per document — exact, trivially
replayable in DuckDB, and O(K·len): fine at the registered K=6,
quadratic-ish pain at a real vocabulary. The production tier
(``functions/text.make_bpe_word_encoder``) is a (rank, position)
pair-priority heap per unique word + LRU cache, O(len·log len)
amortized and independent of K. This script trains K merges with the
textbook sequential trainer on the fixture word dictionary, encodes
every document with BOTH tiers, asserts the outputs are IDENTICAL,
and prints one JSON line with the timings — the BASELINE.md record.

Usage: python scripts/bench_bpe_encode.py [K] [sf_dir]   (K default 256)
No Spark needed: this measures the per-batch Python kernels the
mapInPandas closures run; the surrounding plan is identical either way.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from collections import Counter

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_textbook(counts: Counter, k: int) -> list[tuple[str, str]]:
    seqs = [(list(w), c) for w, c in counts.items()]
    merges: list[tuple[str, str]] = []
    for _ in range(k):
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
                if i + 1 < len(toks) and (toks[i], toks[i + 1]) == best:
                    out.append(toks[i] + toks[i + 1])
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new.append((out, c))
        seqs = new
    return merges


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )

    texts = [
        t or ""
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
    ]
    strip = re.compile(r"[^A-Za-z]+")
    docs_words = [
        [w for w in strip.sub(" ", t).lower().split(" ") if w] for t in texts
    ]
    counts: Counter = Counter(w for ws in docs_words for w in ws)

    # The synthetic fixture text has a ~31-word vocabulary, which
    # exhausts training long before a production K. When that
    # happens, swap in a deterministic Zipf pseudo-corpus (seeded
    # RNG, letter-bigram pseudo-words) sized like the fixture docs so
    # K=256+ merges exist and the measurement reflects a real
    # vocabulary. The tier-equality assert below still runs either way.
    synthetic = len(counts) < 10 * k
    if synthetic:
        import random

        rng = random.Random(20260814)
        letters = "etaoinshrdlucmfwypvbgkjqxz"
        vocab = list(
            dict.fromkeys(
                "".join(
                    rng.choice(letters)
                    for _ in range(rng.randint(3, 11))
                )
                for _ in range(30_000)
            )
        )
        # Zipf draw: rank-weighted choice over the vocabulary.
        weights = [1.0 / (r + 1) for r in range(len(vocab))]
        docs_words = [
            rng.choices(vocab, weights=weights, k=len(ws) or 50)
            for ws in docs_words
        ]
        counts = Counter(w for ws in docs_words for w in ws)

    t0 = time.time()
    merges = train_textbook(counts, k)
    train_sec = time.time() - t0

    # Replace tier: the _make_bpe_encoder convention, whole-doc string.
    pats = [(f"({p1})({p2})", f"({p1}{p2})") for p1, p2 in merges]
    t0 = time.time()
    replace_out = []
    for ws in docs_words:
        s = " ".join("(" + ")(".join(w) + ")" for w in ws)
        for pat, rep in pats:
            s = s.replace(pat, rep)
        replace_out.append(s)
    replace_sec = time.time() - t0

    from turnover_odata_etl_spark.functions.text import make_bpe_word_encoder

    encode_word = make_bpe_word_encoder(merges)
    t0 = time.time()
    heap_out = [
        " ".join(
            "(" + ")(".join(encode_word(w)) + ")" for w in ws
        )
        for ws in docs_words
    ]
    heap_sec = time.time() - t0

    assert heap_out == replace_out, "tiers diverged — pin violated"

    print(
        json.dumps(
            {
                "k": len(merges),
                "docs": len(texts),
                "unique_words": len(counts),
                "train_sec": round(train_sec, 2),
                "replace_tier_sec": round(replace_sec, 2),
                "heap_tier_sec": round(heap_sec, 2),
                "speedup": round(replace_sec / max(heap_sec, 1e-9), 1),
                "synthetic_vocab": synthetic,
                "sf_dir": sf_dir,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
