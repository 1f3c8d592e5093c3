"""Optimistic commit-conflict validation (round 15 — VERDICT r14
item 4): a commit that loses the claim CAS rebases its already-staged
delta onto the new head when the winner's changed buckets are
disjoint, and falls back to the full re-plan when they overlap,
schema drifted, or the layout changed. The race is injected
deterministically: the first `_claim` of the loser's session first
lets a second writer commit, so the loser's claim genuinely collides
and the production recovery path runs end-to-end."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable
from turnover_odata_etl_spark.storage.snapshot import CommitConflict


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def mk(spark, tdir, **kw):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
        **kw,
    )


def batch(spark, pairs):
    return spark.createDataFrame(
        [(k, v) for k, v in pairs], "k long, ver long"
    )


def bucket_of(spark, k, n=4):
    return _bucket_list(spark, n, int(k) + 1)[int(k)]


# {n: [bucket(k) for k ascending]} — Spark's own hash still decides
# (the tests must never re-implement the layout hash), but the probes
# are BATCHED into one memoized job instead of one createDataFrame +
# first() job per key: the original sequential probing cost ~0.6 s per
# key and ~9 s per keys_in_distinct_buckets() call, ~212 s across this
# file's 23 calls (round 17 — the driver's pytest window).
_BUCKETS: dict[int, list[int]] = {}


def _bucket_list(spark, n, hi):
    cur = _BUCKETS.get(n, [])
    if len(cur) < hi:
        rows = (
            spark.range(max(hi, 2048))
            .select(
                "id", F.pmod(F.hash(F.col("id")), F.lit(n)).alias("b")
            )
            .collect()
        )
        rows.sort(key=lambda r: r["id"])
        _BUCKETS[n] = [int(r["b"]) for r in rows]
    return _BUCKETS[n]


def keys_in_distinct_buckets(spark, n=4):
    """One probe key per bucket — the first key of each bucket
    ascending (exactly the original exhaustive search's answer), from
    the batched bucket map; lets each test pick guaranteed-disjoint or
    guaranteed-overlapping keys without depending on hash details."""
    bs = _bucket_list(spark, n, 500)
    found = {}
    for k in range(500):
        found.setdefault(bs[k], k)
        if len(found) == n:
            break
    assert len(found) == n
    return found  # {bucket: key}


def keys_in_bucket(spark, b, count, n=4, exclude=()):
    """``count`` fresh ascending keys that hash into bucket ``b``
    (batched probe, same hash-decides rule)."""
    bs = _bucket_list(spark, n, 4096)
    skip = set(exclude)
    out = [
        k for k in range(len(bs)) if bs[k] == b and k not in skip
    ][:count]
    assert len(out) == count
    return out


def inject_race(monkeypatch, loser, winner_fn):
    """Before the loser's FIRST `_claim`, run ``winner_fn()`` (a
    commit through a second handle) so the claim collides for real.
    Returns a dict counting how many times the loser re-planned
    (prepare passes) vs rebased."""
    state = {"armed": True}
    orig = SnapshotTable._claim

    def racing(self, manifest, new_id):
        if state["armed"] and self is loser:
            state["armed"] = False
            winner_fn()
        return orig(self, manifest, new_id)

    monkeypatch.setattr(SnapshotTable, "_claim", racing)
    return state


def spy_stage_jobs(monkeypatch):
    """Count staged-write promotions — each full (re-)plan of a
    rewriting verb promotes once, so a rebase shows exactly one."""
    counts = {"n": 0}
    orig = SnapshotTable._promote_staged

    def counting(self, staging, run):
        counts["n"] += 1
        return orig(self, staging, run)

    monkeypatch.setattr(SnapshotTable, "_promote_staged", counting)
    return counts


def test_append_rebase_disjoint_lands_without_replan(
    spark, tdir, monkeypatch
):
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    k_winner = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_loser, 1), (k_winner, 1)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_winner, 2)])),
    )
    base_stages = counts["n"]
    sid = t1.append(batch(spark, [(k_loser, 2)]))
    # one staged write for the winner, ONE for the loser — no re-plan
    assert counts["n"] - base_stages == 2
    assert sid == t1.current_id() == 3
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == sorted(
        [(k_loser, 1), (k_winner, 1), (k_winner, 2), (k_loser, 2)]
    )
    # fresh handle agrees — the rebased manifest chain resolves
    assert mk(spark, tdir).read().count() == 4


def test_append_overlapping_bucket_replans_and_still_lands(
    spark, tdir, monkeypatch
):
    by_bucket = keys_in_distinct_buckets(spark)
    k = by_bucket[sorted(by_bucket)[0]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k, 1)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1, lambda: t2.append(batch(spark, [(k, 2)]))
    )
    base_stages = counts["n"]
    t1.append(batch(spark, [(k, 3)]))
    # winner staged once; loser staged, refused the rebase, re-planned
    assert counts["n"] - base_stages == 3
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == [(k, 1), (k, 2), (k, 3)]


def test_merge_rebase_disjoint_lands(spark, tdir, monkeypatch):
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    k_winner = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.merge(batch(spark, [(k_loser, 1), (k_winner, 1)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.merge(batch(spark, [(k_winner, 5)])),
    )
    base_stages = counts["n"]
    t1.merge(batch(spark, [(k_loser, 7)]))
    assert counts["n"] - base_stages == 2  # no loser re-plan
    got = {r["k"]: r["ver"] for r in t1.read().collect()}
    assert got == {k_loser: 7, k_winner: 5}


def test_merge_conflicting_key_replans_keep_latest(
    spark, tdir, monkeypatch
):
    """Same KEY raced: bucket overlap forces the re-plan, and the
    keep-latest invariant holds over the serialized outcome."""
    by_bucket = keys_in_distinct_buckets(spark)
    k = by_bucket[sorted(by_bucket)[0]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.merge(batch(spark, [(k, 1)]))

    inject_race(
        monkeypatch, t1, lambda: t2.merge(batch(spark, [(k, 2)]))
    )
    t1.merge(batch(spark, [(k, 9)]))
    got = [(r["k"], r["ver"]) for r in t1.read().collect()]
    assert got == [(k, 9)]  # ver 9 > 2 > 1 — keep-latest preserved


def test_delete_keys_rebase_disjoint_both_modes(
    spark, tdir, monkeypatch
):
    for mode in ("cow", "mor"):
        sub = os.path.join(tdir, mode)
        by_bucket = keys_in_distinct_buckets(spark)
        buckets = sorted(by_bucket)
        k_del = by_bucket[buckets[0]]
        k_win = by_bucket[buckets[1]]
        t1 = mk(spark, sub)
        t2 = mk(spark, sub)
        t1.append(batch(spark, [(k_del, 1), (k_win, 1)]))

        state = {"armed": True}
        orig = SnapshotTable._claim

        def racing(self, manifest, new_id, _s=state, _t1=t1, _t2=t2,
                   _kw=k_win):
            if _s["armed"] and self is _t1:
                _s["armed"] = False
                _t2.append(batch(spark, [(_kw, 2)]))
            return orig(self, manifest, new_id)

        monkeypatch.setattr(SnapshotTable, "_claim", racing)
        keys = spark.createDataFrame([(k_del,)], "k long")
        t1.delete_keys(keys, mode=mode)
        monkeypatch.setattr(SnapshotTable, "_claim", orig)
        got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
        assert got == [(k_win, 1), (k_win, 2)], mode
        assert mk(spark, sub).read().count() == 2


def test_rebase_refuses_on_schema_evolution(spark, tdir, monkeypatch):
    """The winner evolved the schema: the loser's staged delta can't
    carry verbatim — the rebase refuses and the verb re-plans (and
    the re-planned commit adopts the evolved schema)."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    k_winner = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_loser, 1)]))

    wide = spark.createDataFrame(
        [(k_winner, 1, "x")], "k long, ver long, extra string"
    )
    counts = spy_stage_jobs(monkeypatch)
    inject_race(monkeypatch, t1, lambda: t2.append(wide))
    base_stages = counts["n"]
    t1.append(batch(spark, [(k_loser, 2)]))
    assert counts["n"] - base_stages == 3  # loser re-planned
    cols = set(t1.read().columns)
    assert "extra" in cols
    assert t1.read().count() == 3


def test_rebase_repeated_losses_walks_forward(
    spark, tdir, monkeypatch
):
    """The head moves TWICE while the loser rebases: validation is
    always against the ORIGINAL base, the claim retries walk
    forward, and the commit lands with every writer's rows intact."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    w1, w2 = by_bucket[buckets[1]], by_bucket[buckets[2]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_loser, 1)]))

    state = {"fired": 0}
    orig = SnapshotTable._claim

    def racing(self, manifest, new_id):
        if self is t1 and state["fired"] < 2:
            state["fired"] += 1
            k = w1 if state["fired"] == 1 else w2
            t2.append(batch(spark, [(k, 1)]))
        return orig(self, manifest, new_id)

    monkeypatch.setattr(SnapshotTable, "_claim", racing)
    t1.append(batch(spark, [(k_loser, 2)]))
    assert t1.current_id() == 4  # base + 2 winners + the rebased loser
    assert t1.read().count() == 4


def test_branch_publish_absorbs_disjoint_main_move(spark, tdir):
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_branch = by_bucket[buckets[0]]
    k_main = by_bucket[buckets[1]]
    t = mk(spark, tdir)
    t.append(batch(spark, [(k_branch, 1), (k_main, 1)]))
    b = t.create_branch("wap")
    b.append(batch(spark, [(k_branch, 2)]))
    t.append(batch(spark, [(k_main, 2)]))  # main moves, disjoint
    sid = b.publish()
    assert sid == t.current_id()
    got = sorted((r["k"], r["ver"]) for r in t.read().collect())
    assert got == sorted(
        [(k_branch, 1), (k_main, 1), (k_branch, 2), (k_main, 2)]
    )
    assert t.branches() == []
    # crash-recovery scan still idempotent after a rebased publish
    assert mk(spark, tdir).read().count() == 4


def test_branch_publish_refuses_overlapping_main_move(spark, tdir):
    by_bucket = keys_in_distinct_buckets(spark)
    k = by_bucket[sorted(by_bucket)[0]]
    t = mk(spark, tdir)
    t.append(batch(spark, [(k, 1)]))
    b = t.create_branch("wap")
    b.append(batch(spark, [(k, 2)]))
    t.append(batch(spark, [(k, 3)]))  # main moves INTO the bucket
    with pytest.raises(CommitConflict):
        b.publish()
    assert sorted(r["ver"] for r in t.read().collect()) == [1, 3]
    b.drop()
    assert t.branches() == []

def test_full_anchor_commit_replans_instead_of_rebasing(
    spark, tdir, monkeypatch
):
    """A lost claim whose manifest is a FULL anchor (every 16th id)
    cannot reconstruct its touched set from the manifest (full
    manifests drop empty buckets), so _claim_or_rebase re-plans —
    and the re-planned commit is correct."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    k_winner = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    for i in range(15):  # loser's own claim targets 16 — a FULL id
        t1.append(batch(spark, [(1000 + i, 1)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_winner, 2)])),
    )
    base_stages = counts["n"]
    t1.append(batch(spark, [(k_loser, 2)]))
    # winner staged once; loser staged then RE-PLANNED (full anchor)
    assert counts["n"] - base_stages == 3
    assert t1.current_id() == 17
    assert t1.read().count() == 17
    assert mk(spark, tdir).read().count() == 17


def test_rebase_survives_nullability_drift(spark, tdir, monkeypatch):
    """Nullability drifts between commits with no data change (a
    first commit's lit() columns serialize non-nullable; the same
    columns after the next merge's base-union serialize nullable).
    The schema guard must compare STRUCTURE, not the JSON string —
    a string compare falsely refused the rebase on exactly the
    realistic derived-frame pipelines it exists for (review r15)."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_loser = by_bucket[buckets[0]]
    k_winner = by_bucket[buckets[1]]

    def lit_batch(k, ver):
        # non-nullable columns — the drift trigger
        return spark.range(k, k + 1).select(
            F.col("id").alias("k"),
            F.lit(ver).cast("long").alias("ver"),
        )

    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.merge(lit_batch(k_loser, 1))  # commit 1: ver non-nullable

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1, lambda: t2.merge(lit_batch(k_winner, 1))
    )
    base_stages = counts["n"]
    t1.merge(lit_batch(k_loser, 2))
    # commit 2's schema serializes ver NULLABLE (base-union); the
    # structural compare must still rebase — no loser re-plan
    assert counts["n"] - base_stages == 2
    got = {r["k"]: r["ver"] for r in t1.read().collect()}
    assert got == {k_loser: 2, k_winner: 1}
    assert mk(spark, tdir).read().count() == 2


def test_compact_rebase_disjoint_lands(spark, tdir, monkeypatch):
    """compact is bucket-local (reads only the buckets it folds), so
    a disjoint-bucket winner racing the compact commit is absorbed by
    the rebase — the fold is not re-staged."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_win = by_bucket[buckets[1]]
    # three distinct keys that ALL hash into bucket[0] — the compact
    # target; found via one vectorized probe, not key arithmetic
    # (the hash is not linear in k)
    rows = (
        spark.range(0, 500)
        .select(
            F.col("id").alias("k"),
            F.pmod(F.hash("id"), F.lit(4)).alias("b"),
        )
        .filter(F.col("b") == buckets[0])
        .limit(3)
        .collect()
    )
    ks = [r["k"] for r in rows]
    assert len(ks) == 3
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    for v, k in enumerate(ks, start=1):
        t1.append(batch(spark, [(k, v)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_win, 9)])),
    )
    base_stages = counts["n"]
    t1.compact(min_files=2)
    # winner staged once; the compact fold staged ONCE — no re-plan
    assert counts["n"] - base_stages == 2
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == sorted(
        [(k, v) for v, k in enumerate(ks, start=1)] + [(k_win, 9)]
    )
    assert mk(spark, tdir).read().count() == 4


def test_threaded_writers_disjoint_buckets_all_land(spark, tdir):
    """REAL concurrency (no injection): four threads, each owning one
    bucket, each committing five keyed appends with the production
    retry/rebase path deciding every collision live. All 20 commits
    must land, the final state must be the union, and the snapshot
    chain must resolve from a fresh handle — the serializable-outcome
    pin for the optimistic-concurrency machinery under genuinely
    nondeterministic interleavings."""
    import threading

    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    t0 = mk(spark, tdir)
    t0.append(batch(spark, [(by_bucket[buckets[0]], 0)]))

    errors = []
    per_writer = 5

    # fresh keys per writer, all hashed into THAT writer's bucket —
    # found by the batched probe, so disjointness is guaranteed (and
    # the key search costs one memoized job, not a probe job per key)
    fresh = {
        b: keys_in_bucket(
            spark, b, per_writer, exclude=(by_bucket[buckets[0]],)
        )
        for b in buckets
    }

    def writer(b):
        t = mk(spark, tdir)
        try:
            for i in range(per_writer):
                t.append(batch(spark, [(fresh[b][i], i + 1)]))
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append((b, repr(e)))

    threads = [
        threading.Thread(target=writer, args=(b,)) for b in buckets
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert errors == [], errors
    # 1 bootstrap + 4 writers x 5 commits, every one landed
    assert t0.current_id() == 1 + 4 * per_writer
    assert t0.read().count() == 1 + 4 * per_writer
    assert mk(spark, tdir).read().count() == 1 + 4 * per_writer


# ---------------------------------------------------------------------
# Read-set validation (ADVICE r15): keys a merge_into/delete_keys only
# PROBED (matched nothing at base, wrote no bucket) are part of the
# commit's recorded read set, and a winner that changed a probed
# bucket forces the re-plan — the write-skew guard. Without it, a
# concurrent insert of exactly the probed key would slip past
# write-set disjointness and the rebased commit would land without
# updating/deleting it.


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_merge_into_replans_when_probed_key_inserted(
    spark, tdir, monkeypatch, mode
):
    """Loser merge_into updates k_upd (exists) and PROBES k_probe
    (absent — update-only, so no bucket is written for it); winner
    inserts exactly k_probe. Write sets are disjoint, but the read
    set overlaps — the rebase must refuse, and the re-plan then sees
    the winner's row and updates it (the winner-first serial
    outcome)."""
    sub = os.path.join(tdir, mode)
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_upd = by_bucket[buckets[0]]
    k_probe = by_bucket[buckets[1]]
    t1 = mk(spark, sub)
    t2 = mk(spark, sub)
    t1.append(batch(spark, [(k_upd, 1)]))

    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_probe, 1)])),
    )
    t1.merge_into(
        batch(spark, [(k_upd, 10), (k_probe, 10)]),
        when_matched="update",
        when_not_matched="ignore",
        mode=mode,
    )
    got = {r["k"]: r["ver"] for r in t1.read().collect()}
    # a rebased (write-set-only) commit would leave k_probe at 1
    assert got == {k_upd: 10, k_probe: 10}, mode
    assert mk(spark, sub).read().count() == 2


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_keys_replans_when_probed_key_appears(
    spark, tdir, monkeypatch, mode
):
    """Loser deletes [k_a, k_b] where k_b matches nothing at base;
    winner inserts k_b concurrently. The read set covers k_b's
    bucket, so the loser re-plans and deletes BOTH — the winner-first
    serial outcome (a write-set-only rebase would resurrect k_b)."""
    sub = os.path.join(tdir, mode)
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_a = by_bucket[buckets[0]]
    k_b = by_bucket[buckets[1]]
    t1 = mk(spark, sub)
    t2 = mk(spark, sub)
    t1.append(batch(spark, [(k_a, 1)]))

    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_b, 1)])),
    )
    keys = spark.createDataFrame([(k_a,), (k_b,)], "k long")
    t1.delete_keys(keys, mode=mode)
    assert t1.read().count() == 0, mode
    assert mk(spark, sub).read().count() == 0


def test_write_skew_two_merge_intos_serialize(spark, tdir, monkeypatch):
    """The ADVICE r15 anomaly, end-to-end: M1 updates k_x and probes
    k_b; M2 (the racing winner) INSERTS k_b via its own merge_into.
    Under write-set-only validation both commits would land with k_b
    never receiving M1's update — an outcome NO serial order
    produces (M1;M2 leaves k_b at M2's insert ver, M2;M1 updates it;
    the skewed outcome differs from both because k_x and k_b would
    mix the two orders). With read-set validation M1 re-plans and
    the final state equals the M2;M1 serial order exactly."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_x = by_bucket[buckets[0]]
    k_b = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_x, 1)]))

    inject_race(
        monkeypatch, t1,
        lambda: t2.merge_into(
            batch(spark, [(k_b, 5)]),
            when_matched="ignore",
            when_not_matched="insert",
        ),
    )
    t1.merge_into(
        batch(spark, [(k_x, 10), (k_b, 10)]),
        when_matched="update",
        when_not_matched="ignore",
    )
    got = {r["k"]: r["ver"] for r in t1.read().collect()}
    assert got == {k_x: 10, k_b: 10}  # M2;M1 — serial-equivalent
    assert mk(spark, tdir).read().count() == 2


def test_merge_into_still_rebases_when_probes_are_disjoint(
    spark, tdir, monkeypatch
):
    """Control: the read-set guard must not cost the rebase win when
    the winner's buckets are disjoint from BOTH the loser's writes
    and its probes — the loser lands without a re-plan."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_upd = by_bucket[buckets[0]]
    k_probe = by_bucket[buckets[1]]
    k_win = by_bucket[buckets[2]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_upd, 1), (k_win, 1)]))

    counts = spy_stage_jobs(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_win, 2)])),
    )
    base_stages = counts["n"]
    t1.merge_into(
        batch(spark, [(k_upd, 10), (k_probe, 10)]),
        when_matched="update",
        when_not_matched="ignore",
    )
    # winner staged once, loser staged ONCE — rebase, no re-plan
    assert counts["n"] - base_stages == 2
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    # k_win's ver-1 and ver-2 rows both live (append, not upsert)
    assert got == sorted([(k_upd, 10), (k_win, 1), (k_win, 2)])


def test_branch_publish_refuses_when_main_inserts_probed_key(
    spark, tdir
):
    """The publish half of the guard: a branch merge_into that only
    PROBED k_b (update-only, no match at fork) records k_b's bucket
    in its read set; main inserting k_b after the fork must refuse
    the publish even though the WRITE sets are disjoint."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_upd = by_bucket[buckets[0]]
    k_b = by_bucket[buckets[1]]
    t = mk(spark, tdir)
    t.append(batch(spark, [(k_upd, 1)]))
    b = t.create_branch("wap")
    b.merge_into(
        batch(spark, [(k_upd, 10), (k_b, 10)]),
        when_matched="update",
        when_not_matched="ignore",
    )
    t.append(batch(spark, [(k_b, 1)]))  # main inserts the probed key
    with pytest.raises(CommitConflict):
        b.publish()
    b.drop()

    # control: with main's move in a bucket NEITHER written NOR
    # probed, the publish still absorbs it
    k_free = by_bucket[buckets[2]]
    b2 = t.create_branch("wap2")
    b2.merge_into(
        batch(spark, [(k_upd, 20), (k_b, 20)]),
        when_matched="update",
        when_not_matched="ignore",
    )
    t.append(batch(spark, [(k_free, 1)]))  # disjoint from reads too
    sid = b2.publish()
    assert sid == t.current_id()
    got = {r["k"]: r["ver"] for r in t.read().collect()}
    assert got[k_upd] == 20 and got[k_b] == 20 and got[k_free] == 1


# ---------------------------------------------------------------------
# Predicate-verb rebase via stats disjointness (round 16 — VERDICT r15
# item 6): delete_where/update_where record their predicate as the
# commit's read set; on a lost CAS the rebase lands iff every file the
# winner ADDED is stats-proven unable to match the predicate, and
# re-plans otherwise (the always-correct default).


def spy_plans(monkeypatch):
    """Count full (re-)plan passes of the predicate verbs — each
    attempt calls _split_candidates exactly once (both COW and MOR),
    so a rebase shows one call, a re-plan two."""
    counts = {"n": 0}
    orig = SnapshotTable._split_candidates

    def counting(self, base_bb, bounds):
        counts["n"] += 1
        return orig(self, base_bb, bounds)

    monkeypatch.setattr(SnapshotTable, "_split_candidates", counting)
    return counts


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_rebases_when_winner_provably_disjoint(
    spark, tdir, monkeypatch, mode
):
    sub = os.path.join(tdir, mode)
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_del = by_bucket[buckets[0]]
    k_win = by_bucket[buckets[1]]
    t1 = mk(spark, sub)
    t2 = mk(spark, sub)
    t1.append(batch(spark, [(k_del, 150), (k_win, 150)]))

    counts = spy_plans(monkeypatch)
    inject_race(
        monkeypatch, t1,
        # winner's new file: ver = 1, stats window [1, 1] — provably
        # outside the loser's BETWEEN 100 AND 200 read set
        lambda: t2.append(batch(spark, [(k_win, 1)])),
    )
    base_plans = counts["n"]
    t1.delete_where(f"ver BETWEEN 100 AND 200 AND k = {k_del}",
                    mode=mode)
    assert counts["n"] - base_plans == 1, mode  # rebase — no re-plan
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == sorted([(k_win, 150), (k_win, 1)]), mode
    assert mk(spark, sub).read().count() == 2


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_delete_where_replans_when_winner_adds_matching_rows(
    spark, tdir, monkeypatch, mode
):
    """Winner inserts a row INSIDE the predicate window (disjoint
    bucket, so the write sets never overlap): the stats check must
    refuse the rebase, and the re-plan then deletes the winner's row
    too — the winner-first serial outcome."""
    sub = os.path.join(tdir, mode)
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_del = by_bucket[buckets[0]]
    k_win = by_bucket[buckets[1]]
    t1 = mk(spark, sub)
    t2 = mk(spark, sub)
    t1.append(batch(spark, [(k_del, 150), (k_win, 1)]))

    counts = spy_plans(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_win, 160)])),
    )
    base_plans = counts["n"]
    t1.delete_where("ver BETWEEN 100 AND 200", mode=mode)
    assert counts["n"] - base_plans == 2, mode  # refused, re-planned
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == [(k_win, 1)], mode
    assert mk(spark, sub).read().count() == 1


def test_update_where_rebases_when_winner_provably_disjoint(
    spark, tdir, monkeypatch
):
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_upd = by_bucket[buckets[0]]
    k_win = by_bucket[buckets[1]]
    t1 = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
    )
    t2 = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
    )
    # k_win's base row sits OUTSIDE the predicate window, so the
    # update touches only k_upd's bucket and the winner's bucket is
    # genuinely disjoint
    t1.append(
        spark.createDataFrame(
            [(k_upd, 150, 10), (k_win, 1, 20)],
            "k long, ver long, v long",
        )
    )

    counts = spy_plans(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(
            spark.createDataFrame(
                [(k_win, 2, 30)], "k long, ver long, v long"
            )
        ),
    )
    base_plans = counts["n"]
    t1.update_where("ver BETWEEN 100 AND 200", {"v": "v + 1000"})
    assert counts["n"] - base_plans == 1  # rebase — no re-plan
    got = sorted((r["k"], r["ver"], r["v"]) for r in t1.read().collect())
    assert got == sorted(
        [(k_upd, 150, 1010), (k_win, 1, 20), (k_win, 2, 30)]
    )


def test_unparseable_predicate_always_replans(spark, tdir, monkeypatch):
    """OR predicates yield no bounds — the rebase can prove nothing
    and must take the always-correct re-plan, whatever the winner
    wrote."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_del = by_bucket[buckets[0]]
    k_win = by_bucket[buckets[1]]
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(batch(spark, [(k_del, 150), (k_win, 1)]))

    counts = spy_plans(monkeypatch)
    inject_race(
        monkeypatch, t1,
        lambda: t2.append(batch(spark, [(k_win, 2)])),
    )
    base_plans = counts["n"]
    t1.delete_where("ver = 150 OR ver = 9999")
    assert counts["n"] - base_plans == 2  # no bounds — re-plan
    got = sorted((r["k"], r["ver"]) for r in t1.read().collect())
    assert got == [(k_win, 1), (k_win, 2)]


def test_branch_publish_predicate_guard(spark, tdir):
    """Publish half: a branch predicate delete records its read
    predicate; main adding a MATCHING row after the fork refuses the
    publish, a provably-disjoint main move still absorbs."""
    by_bucket = keys_in_distinct_buckets(spark)
    buckets = sorted(by_bucket)
    k_del = by_bucket[buckets[0]]
    k_main = by_bucket[buckets[1]]
    t = mk(spark, tdir)
    t.append(batch(spark, [(k_del, 150), (k_main, 1)]))
    b = t.create_branch("wap")
    b.delete_where("ver BETWEEN 100 AND 200")
    t.append(batch(spark, [(k_main, 160)]))  # matching — must refuse
    with pytest.raises(CommitConflict):
        b.publish()
    b.drop()

    # after the drop, main holds (k_del,150),(k_main,1),(k_main,160);
    # use a THIRD bucket for main's disjoint move so the branch
    # delete's write set (both matched buckets) never overlaps it
    k_free = by_bucket[buckets[2]]
    b2 = t.create_branch("wap2")
    b2.delete_where("ver BETWEEN 100 AND 200")
    t.append(batch(spark, [(k_free, 2)]))  # provably disjoint
    sid = b2.publish()
    assert sid == t.current_id()
    got = sorted((r["k"], r["ver"]) for r in t.read().collect())
    assert got == sorted([(k_main, 1), (k_free, 2)])
