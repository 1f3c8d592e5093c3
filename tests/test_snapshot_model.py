"""Model-based randomized testing of the snapshot-table protocol.

The targeted tests in ``test_snapshot.py`` pin individual mechanisms
(CAS race, crash injection, pruned reads). This file pins the
PROTOCOL: a seeded random sequence of merge / tombstone-merge /
delete-where / delete-keys / update-where / merge-into (each
randomly copy-on-write or merge-on-read, round 14) / zorder /
rebucket / branch-publish-or-drop (round 14, WAP) / rename-column
(round 16, field-id schema evolution — the value column flips
between two names mid-history, so every later batch, read, time
travel, and CDC diff crosses rename boundaries) / expire
operations runs against both the real
``SnapshotTable`` and a 20-line in-memory reference model (a dict with
keep-latest semantics), and after EVERY step the table must agree with
the model on the current state, on a time-travel read of every still-
live snapshot, and on the net CDC diff between random live snapshot
pairs. Any divergence the targeted tests failed to anticipate —
layout adoption after rebucket, carry-forward across expires,
keep-latest against a re-inserted key whose tombstone aged out —
surfaces here as a concrete 10-step reproduction.
"""

from __future__ import annotations

import random

import pytest

from turnover_odata_etl_spark.storage import SnapshotTable

SCHEMA = "k long, v string, ver long"


def table_state(t, sid=None, vname="v"):
    return {
        r["k"]: (r["ver"], r[vname])
        for r in t.read(snapshot_id=sid).collect()
    }


def model_diff(old: dict, new: dict) -> set:
    """Net-form CDC rows: (k, v, ver, change_type) — post-image for
    insert/update, pre-image for delete (the changes() contract)."""
    out = set()
    for k, (ver, v) in new.items():
        if k not in old:
            out.add((k, v, ver, "insert"))
        elif old[k] != (ver, v):
            out.add((k, v, ver, "update"))
    for k, (ver, v) in old.items():
        if k not in new:
            out.add((k, v, ver, "delete"))
    return out


@pytest.mark.parametrize(
    "seed",
    [
        11,
        # seeds 23/47 draw op mixes heavy on rebucket/zorder and ran
        # 23 s/61 s — same invariants, bigger dice; slow-marked so the
        # driver-window run keeps one full 20-op model check (seed 11)
        # and the round-close SPARK_GRAFT_FULL_TESTS run covers all
        # three (round 17)
        pytest.param(23, marks=pytest.mark.slow),
        pytest.param(47, marks=pytest.mark.slow),
    ],
)
def test_snapshot_protocol_against_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = SnapshotTable(
        spark, str(tmp_path / "t"), key_cols=["k"], order_col="ver",
        n_buckets=rng.choice([2, 4]),
    )
    cur: dict[int, tuple[int, str]] = {}
    live_states: dict[int, dict] = {}  # sid -> model state
    live_names: dict[int, str] = {}  # sid -> value-column name there
    ver_counter = 0
    vname = "v"  # current name of the value column (evolve flips it)

    def frame(rows):
        df = spark.createDataFrame(rows, SCHEMA)
        return df if vname == "v" else df.withColumnRenamed("v", vname)

    # 20 steps: random commit chains CROSS the FULL_MANIFEST_EVERY=16
    # boundary, so delta-manifest resolution (round 9) is exercised
    # across a periodic full anchor under every op mix.
    for step in range(20):
        op = rng.choices(
            [
                "merge", "tomb_merge", "rebucket", "expire", "delete",
                "delete_keys", "update", "merge_into", "zorder",
                "branch", "race", "evolve",
            ],
            weights=[6, 3, 1, 1, 2, 1, 2, 3, 1, 2, 2, 2],
        )[0]
        if op in ("merge", "tomb_merge"):
            rows = []
            for _ in range(rng.randint(0, 6)):
                k = rng.randint(0, 9)
                ver_counter += 1
                v = (
                    "DEL"
                    if op == "tomb_merge" and rng.random() < 0.5
                    else f"v{ver_counter}"
                )
                rows.append((k, v, ver_counter))
            df = frame(rows)
            sid = t.merge(df, tombstone_filter=f"{vname} = 'DEL'")
            # model: keep-latest per key against the CURRENT state,
            # then the winning row's tombstone drops the key
            for k, v, ver in rows:
                if k not in cur or cur[k][0] < ver:
                    cur[k] = (ver, v)
            cur = {k: kv for k, kv in cur.items() if kv[1] != "DEL"}
            live_states[sid] = dict(cur)
        elif op == "delete":
            if t.current_id() is None:
                continue
            # random ver range (exercises the stats prune) or a key
            # equality (exercises the bucket-level stage-2 prune)
            if rng.random() < 0.5:
                lo = rng.randint(0, max(ver_counter, 1))
                hi = lo + rng.randint(0, 5)
                pred = f"ver BETWEEN {lo} AND {hi}"
                new_cur = {
                    k: kv for k, kv in cur.items()
                    if not (lo <= kv[0] <= hi)
                }
            else:
                kk = rng.randint(0, 9)
                pred = f"k = {kk}"
                new_cur = {k: kv for k, kv in cur.items() if k != kk}
            sid = t.delete_where(pred, mode=rng.choice(["cow", "mor"]))
            if new_cur != cur:
                cur = new_cur
                live_states[sid] = dict(cur)
            else:  # no-op contract: current id unchanged, no commit
                assert sid == t.current_id()
        elif op == "delete_keys":
            if t.current_id() is None:
                continue
            kk = rng.sample(range(10), rng.randint(1, 3))
            sid = t.delete_keys(
                spark.createDataFrame([(k,) for k in kk], "k long"),
                mode=rng.choice(["cow", "mor"]),
            )
            new_cur = {k: kv for k, kv in cur.items() if k not in kk}
            if new_cur != cur:
                cur = new_cur
                live_states[sid] = dict(cur)
            else:
                assert sid == t.current_id()
        elif op == "update":
            if t.current_id() is None:
                continue
            lo = rng.randint(0, max(ver_counter, 1))
            hi = lo + rng.randint(0, 5)
            sid = t.update_where(
                f"ver BETWEEN {lo} AND {hi}",
                {vname: f"{vname} || '+'"},
                mode=rng.choice(["cow", "mor"]),
            )
            new_cur = {
                k: (ver, v + "+" if lo <= ver <= hi else v)
                for k, (ver, v) in cur.items()
            }
            if new_cur != cur:
                cur = new_cur
                live_states[sid] = dict(cur)
            else:
                assert sid == t.current_id()
        elif op == "merge_into":
            if t.current_id() is None:
                continue
            wm = rng.choice(["update", "delete", "ignore"])
            wnm = rng.choice(["insert", "ignore"])
            cond = rng.choice([None, "s_ver > t_ver"])
            srows = {}
            for _ in range(rng.randint(1, 4)):
                k = rng.randint(0, 9)
                # mix fresh and stale source versions so the
                # conditional arm genuinely fires AND misses
                if rng.random() < 0.7:
                    ver_counter += 1
                    sver = ver_counter
                else:
                    sver = rng.randint(0, max(ver_counter, 1))
                srows[k] = (sver, f"mi{step}k{k}v{sver}")
            df = frame(
                [(k, v, ver) for k, (ver, v) in srows.items()]
            )
            sid = t.merge_into(
                df, when_matched=wm, matched_condition=cond,
                when_not_matched=wnm, mode=rng.choice(["cow", "mor"]),
            )
            new_cur = dict(cur)
            for k, (sver, sv) in srows.items():
                if k in cur:
                    fired = cond is None or sver > cur[k][0]
                    if wm == "update" and fired:
                        new_cur[k] = (sver, sv)
                    elif wm == "delete" and fired:
                        new_cur.pop(k, None)
                elif wnm == "insert":
                    new_cur[k] = (sver, sv)
            if new_cur != cur:
                cur = new_cur
                live_states[sid] = dict(cur)
            else:  # nothing fired anywhere — no-op, no commit
                assert sid == t.current_id()
        elif op == "zorder":
            if t.current_id() is None:
                continue
            cols = rng.choice([["k"], ["ver"], ["k", "ver"]])
            sid = t.rewrite_zorder(
                cols, rows_per_file=rng.choice([2, 8])
            )
            # pure layout change: same model state; the invariants
            # below then prove reads, time travel, and net CDC are
            # layout-independent across the rewrite commit
            live_states[sid] = dict(cur)
        elif op == "branch":
            # WAP (round 14): fork, run a short random chain ON the
            # branch, prove main never moved, then publish (branch
            # states become live main snapshots) or drop (no trace)
            if t.current_id() is None:
                continue
            b = t.create_branch(f"wap{step}")
            bcur = dict(cur)
            bstates: dict[int, dict] = {}
            for _ in range(rng.randint(1, 2)):
                if rng.random() < 0.6:
                    rows = []
                    for _ in range(rng.randint(1, 4)):
                        k = rng.randint(0, 9)
                        ver_counter += 1
                        rows.append((k, f"b{ver_counter}", ver_counter))
                    bsid = b.merge(frame(rows))
                    for k, v, ver in rows:
                        if k not in bcur or bcur[k][0] < ver:
                            bcur[k] = (ver, v)
                    bstates[bsid] = dict(bcur)
                else:
                    kk = rng.randint(0, 9)
                    bsid = b.delete_where(
                        f"k = {kk}", mode=rng.choice(["cow", "mor"])
                    )
                    nb = {k: kv for k, kv in bcur.items() if k != kk}
                    if nb != bcur:
                        bcur = nb
                        bstates[bsid] = dict(bcur)
            # invisibility: main state and id unmoved by branch work
            assert table_state(t, vname=vname) == cur, (
                f"seed={seed} step={step} branch leaked into main"
            )
            if bstates and rng.random() < 0.6:
                psid = b.publish()
                cur = bcur
                # squash publish: ONE new live main snapshot holding
                # the branch head's state (intermediate branch states
                # are branch-only and die with the branch names)
                live_states[psid] = dict(bcur)
            else:
                b.drop()
            assert t.branches() == []
        elif op == "race":
            # Two-writer CAS race (round 15 — optimistic rebase): a
            # second handle commits BETWEEN this handle's prepare and
            # claim. Whether the engine rebases (disjoint buckets) or
            # re-plans (overlap), the observable outcome must be the
            # SERIAL winner-then-loser composition — keys 0..9 over
            # 2-4 buckets exercise both paths organically.
            if t.current_id() is None:
                continue
            t2 = SnapshotTable(
                spark, str(tmp_path / "t"), key_cols=["k"],
                order_col="ver", n_buckets=t.n_buckets,
            )
            wrows, lrows = [], []
            for rows in (wrows, lrows):
                for _ in range(rng.randint(1, 3)):
                    k = rng.randint(0, 9)
                    ver_counter += 1
                    rows.append((k, f"r{ver_counter}", ver_counter))
            wdf = frame(wrows)
            armed = {"on": True}
            orig_claim = SnapshotTable._claim

            def racing(self, manifest, new_id, _a=armed, _t=t,
                       _t2=t2, _wdf=wdf):
                if _a["on"] and self is _t:
                    _a["on"] = False
                    _t2.merge(_wdf)
                return orig_claim(self, manifest, new_id)

            loser_kind = rng.choice(["merge", "delete_where"])
            if loser_kind == "merge" or not cur:
                ldf = frame(lrows)
                SnapshotTable._claim = racing
                try:
                    lsid = t.merge(ldf)
                finally:
                    SnapshotTable._claim = orig_claim
                for k, v, ver in wrows:  # winner lands first
                    if k not in cur or cur[k][0] < ver:
                        cur[k] = (ver, v)
                live_states[lsid - 1] = dict(cur)  # winner's snapshot
                for k, v, ver in lrows:  # loser lands on top
                    if k not in cur or cur[k][0] < ver:
                        cur[k] = (ver, v)
                live_states[lsid] = dict(cur)
            else:
                # predicate-delete loser (round 16 — stats-disjoint
                # rebase or re-plan, chosen live by the engine; the
                # outcome must equal winner-then-delete either way).
                # lo anchors on an EXISTING ver so the delete matches
                # at base and genuinely reaches its claim.
                lo = rng.choice([ver for (ver, _x) in cur.values()])
                hi = lo + rng.randint(0, 5)
                SnapshotTable._claim = racing
                try:
                    lsid = t.delete_where(
                        f"ver BETWEEN {lo} AND {hi}",
                        mode=rng.choice(["cow", "mor"]),
                    )
                finally:
                    SnapshotTable._claim = orig_claim
                for k, v, ver in wrows:  # winner lands first
                    if k not in cur or cur[k][0] < ver:
                        cur[k] = (ver, v)
                wstate = dict(cur)
                new_cur = {
                    k: kv for k, kv in cur.items()
                    if not (lo <= kv[0] <= hi)
                }
                if new_cur != cur:
                    live_states[lsid - 1] = wstate
                    cur = new_cur
                    live_states[lsid] = dict(cur)
                else:  # delete no-opped post-winner: lsid IS winner's
                    live_states[lsid] = wstate
        elif op == "rebucket":
            if t.current_id() is None:
                continue
            sid = t.rebucket(rng.choice([2, 4, 8]))
            live_states[sid] = dict(cur)
        elif op == "evolve":
            # Field-id rename (round 16): metadata-only commit, same
            # model state; the value column flips between two names
            # (rename BACK to an own former name is the documented
            # same-field-id allowance), so every later op and every
            # invariant below crosses a rename boundary.
            if t.current_id() is None:
                continue
            new_name = "v2" if vname == "v" else "v"
            sid = t.rename_column(vname, new_name)
            vname = new_name
            live_states[sid] = dict(cur)
        else:  # expire
            if len(live_states) < 3:
                continue
            t.expire_snapshots(keep_last=2)
            survivors = set(t.snapshot_ids())
            live_states = {
                s: st for s, st in live_states.items() if s in survivors
            }

        if t.current_id() is None:
            assert cur == {}
            continue
        # each live snapshot reads with the value-column name that
        # was current when it was recorded (rename is time-travel-
        # transparent: old snapshots keep their own schema)
        for s in live_states:
            live_names.setdefault(s, vname)
        live_names = {
            s: n for s, n in live_names.items() if s in live_states
        }
        # invariant 1: current state == model — checked through BOTH
        # the session handle and a FRESH handle (cold manifest cache:
        # the delta chain must resolve from disk alone)
        assert table_state(t, vname=vname) == cur, (
            f"seed={seed} step={step} op={op}"
        )
        if step % 5 == 4:
            t_cold = SnapshotTable(
                spark, t.table_dir, key_cols=["k"], order_col="ver",
                n_buckets=t.n_buckets,
            )
            assert table_state(t_cold, vname=vname) == cur, (
                f"seed={seed} step={step} cold-handle resolution"
            )
        # invariant 2: every live snapshot time-travels to its model
        for sid_, want in live_states.items():
            assert table_state(t, sid_, vname=live_names[sid_]) == want, (
                f"seed={seed} step={step} time-travel sid={sid_}"
            )
        # invariant 3: net CDC between a random live pair == model diff
        # (changes() emits under the TO snapshot's schema — lineage
        # resolves the FROM side across any rename in the span)
        if len(live_states) >= 2:
            a, b = sorted(rng.sample(sorted(live_states), 2))
            nb = live_names[b]
            got = {
                (r["k"], r[nb], r["ver"], r["_change_type"])
                for r in t.changes(a, b).collect()
            }
            assert got == model_diff(live_states[a], live_states[b]), (
                f"seed={seed} step={step} changes({a},{b})"
            )
