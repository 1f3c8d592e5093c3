"""SnapshotTable.delete_where (round 11, VERDICT r10 item 4):
predicate delete as a copy-on-write commit — SQL DELETE semantics,
file-level stats pruning, carry-by-reference, crash + CAS coverage
mirroring what append/compact got in round 10."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from turnover_odata_etl_spark.storage import SnapshotTable
from turnover_odata_etl_spark.storage.snapshot import predicate_bounds


def rows(df):
    return sorted(
        (r["k"], r["v"], r["ver"])
        for r in df.select("k", "v", "ver").collect()
    )


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "snaptable")


def make_table(spark, tdir, n_buckets=4):
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=n_buckets
    )


def batch(spark, triples):
    return spark.createDataFrame(
        [(k, v, ver) for k, v, ver in triples],
        "k long, v string, ver long",
    )


# ---------------------------------------------------------------- bounds


def test_predicate_bounds_simple_forms():
    inf = float("inf")
    assert predicate_bounds("ver <= 5") == {"ver": (-inf, 5.0)}
    assert predicate_bounds("ver > 3") == {"ver": (3.0, inf)}
    assert predicate_bounds("ver = 7") == {"ver": (7.0, 7.0)}
    assert predicate_bounds("ver BETWEEN 2 AND 9") == {"ver": (2.0, 9.0)}
    assert predicate_bounds("a >= 1 AND a < 4 AND b = 2") == {
        "a": (1.0, 4.0),
        "b": (2.0, 2.0),
    }
    # contradictory conjuncts intersect to an empty interval (lo > hi)
    lo, hi = predicate_bounds("a > 10 AND a < 5")["a"]
    assert lo > hi


def test_predicate_bounds_skips_unparsed_conjuncts_soundly():
    # string conjunct yields string bounds (round 12); numeric narrows
    assert predicate_bounds("ver <= 5 AND v = 'click'") == {
        "ver": (-float("inf"), 5.0),
        "v": ("click", "click"),
    }
    # != / <> / col-vs-col conjuncts skip, never misread
    assert predicate_bounds("a != 3 AND b <= 2") == {
        "b": (-float("inf"), 2.0)
    }
    assert predicate_bounds("a <> 3") == {}
    assert predicate_bounds("a = b") == {}


def test_predicate_bounds_refuses_unsafe_structure():
    # deriving bounds from one arm of an OR would cause MISSED deletes
    assert predicate_bounds("a = 1 OR b = 2") == {}
    assert predicate_bounds("a = 1 OR b = 2 AND c = 3") == {}
    assert predicate_bounds("NOT a = 1") == {}
    assert predicate_bounds("(a = 1) AND b = 2") == {}
    assert predicate_bounds("a IN 1") == {}
    # ADVICE r11 (high): CASE..END nests AND without parentheses — the
    # AND-split would mine x=(5,5) from a predicate that is TRUE for
    # every row (ELSE 1 = 1). Any CASE keyword refuses the predicate.
    assert (
        predicate_bounds(
            "CASE WHEN a AND x = 5 AND b THEN 1 ELSE 1 END = 1"
        )
        == {}
    )
    assert predicate_bounds("case when x = 5 then 1 else 1 end = 1") == {}
    assert predicate_bounds("a = 1 AND CASE WHEN x = 5 THEN 1 END = 1") == {}
    # bare keyword fragments refuse too (conservative over clever)
    assert predicate_bounds("x = 5 AND WHEN = 1") == {}
    # ...but columns merely CONTAINING a keyword are unaffected
    assert predicate_bounds("end_time <= 5") == {
        "end_time": (float("-inf"), 5.0)
    }
    assert predicate_bounds("weekend = 3") == {"weekend": (3.0, 3.0)}
    # AND/OR INSIDE a string literal is data, not structure
    assert predicate_bounds("v = 'x AND y' AND ver <= 5") == {
        "ver": (-float("inf"), 5.0),
        "v": ("x AND y", "x AND y"),
    }
    assert predicate_bounds("v = 'x OR y' AND ver <= 5") == {
        "ver": (-float("inf"), 5.0),
        "v": ("x OR y", "x OR y"),
    }
    # unbalanced quote — no pruning at all
    assert predicate_bounds("v = 'x AND ver <= 5") == {}


def test_predicate_bounds_string_forms():
    """Round 12 (VERDICT r11 item 3): string comparisons yield bounds
    too — '' is the bottom sentinel, None means unbounded above."""
    assert predicate_bounds("v = 'click'") == {"v": ("click", "click")}
    assert predicate_bounds("v == 'x'") == {"v": ("x", "x")}
    assert predicate_bounds("v <= 'm'") == {"v": ("", "m")}
    assert predicate_bounds("v < 'm'") == {"v": ("", "m")}
    assert predicate_bounds("v > 'm'") == {"v": ("m", None)}
    assert predicate_bounds("v >= 'a' AND v < 'f'") == {"v": ("a", "f")}
    # '' escapes resolve to the raw literal
    assert predicate_bounds("v = 'it''s'") == {"v": ("it's", "it's")}
    # mixed numeric + string conjuncts each narrow their own column
    assert predicate_bounds("a <= 5 AND v = 'x'") == {
        "a": (-float("inf"), 5.0),
        "v": ("x", "x"),
    }
    # cross-domain conflict on a column drops THAT column only
    assert predicate_bounds("v = 'x' AND v = 5 AND a > 1") == {
        "a": (1.0, float("inf"))
    }
    assert predicate_bounds("v = 5 AND v = 'x'") == {}


# ---------------------------------------------------------------- delete


def test_delete_where_basic_and_time_travel(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)]))
    sid = t.delete_where("ver >= 2")
    assert sid == 2
    assert rows(t.read()) == [(1, "a", 1)]
    # deleted rows remain readable at the pre-delete snapshot
    assert rows(t.read(snapshot_id=1)) == [
        (1, "a", 1), (2, "b", 2), (3, "c", 3),
    ]
    m = t._manifest(sid)
    assert m["operation"] == "delete"
    assert m["properties"]["delete.predicate"] == "ver >= 2"


def test_delete_where_null_and_false_rows_survive(spark, tdir):
    """SQL DELETE semantics: NULL predicate == not deleted."""
    t = make_table(spark, tdir)
    t.merge(
        spark.createDataFrame(
            [(1, None, 1), (2, "drop", 2), (3, "keep", 3)],
            "k long, v string, ver long",
        )
    )
    t.delete_where("v = 'drop'")
    assert rows(t.read()) == [(1, None, 1), (3, "keep", 3)]


def test_delete_where_no_match_is_noop(spark, tdir):
    t = make_table(spark, tdir)
    sid = t.merge(batch(spark, [(1, "a", 1)]))
    # stats prove no file overlaps — returns current id, no commit
    assert t.delete_where("ver > 100") == sid
    # candidates opened but nothing matched — still no commit
    assert t.delete_where("v = 'nope'") == sid
    assert t.snapshot_ids() == [sid]


def test_delete_where_empty_table_raises(spark, tdir):
    t = make_table(spark, tdir)
    with pytest.raises(ValueError, match="no commits"):
        t.delete_where("ver > 0")


def test_delete_where_prunes_files_by_stats(spark, tdir, monkeypatch):
    """The stats prune must keep non-overlapping files CLOSED (spy on
    the parquet read) and carried BY REFERENCE (identical manifest
    entries), while the delete itself stays exact."""
    t = make_table(spark, tdir, n_buckets=2)
    # three commits -> per-bucket files with disjoint ver ranges
    t.merge(batch(spark, [(i, "lo", i) for i in range(0, 20)]))
    t.merge(batch(spark, [(i, "mid", i) for i in range(100, 120)]))
    t.merge(batch(spark, [(i, "hi", i) for i in range(200, 220)]))
    base = t.current_id()
    before = {f["path"]: f for f in t._manifest(base)["files"]}
    assert all("ver" in (f.get("stats") or {}) for f in before.values())

    opened: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        opened.extend(paths)
        return real_parquet(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    sid = t.delete_where("ver BETWEEN 100 AND 119")
    monkeypatch.undo()

    assert rows(t.read()) == sorted(
        [(i, "lo", i) for i in range(0, 20)]
        + [(i, "hi", i) for i in range(200, 220)]
    )
    # only mid-range files were opened by the delete's candidate read
    opened_mid = [p for p in opened if p.endswith(".parquet")]
    for p in opened_mid:
        entry = next(
            f for f in before.values() if p.endswith(f["path"])
        )
        s = entry["stats"]["ver"]
        assert not (s[1] < 100 or s[0] > 119), f"pruned file opened: {p}"
    # lo/hi files carried by reference: same entries in the new manifest
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    for p, f in before.items():
        s = f["stats"]["ver"]
        if s[1] < 100 or s[0] > 119:
            assert after[p] == f
        else:
            assert p not in after  # rewritten away


def test_delete_where_rewrites_only_matched_buckets(spark, tdir):
    """A candidate file in a bucket where nothing ACTUALLY matched
    keeps its original file (stage-2 prune past the stats)."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(40)]))
    base = t.current_id()
    before = {f["path"]: f for f in t._manifest(base)["files"]}
    # delete exactly one key: stats on ver ([1,1] everywhere) cannot
    # prune, so every file is a candidate — but only k=7's bucket holds
    # a match and only it may be rewritten
    target_bucket = (
        batch(spark, [(7, "x", 1)])
        .select(F.pmod(F.hash("k"), F.lit(8)).alias("b"))
        .first()["b"]
    )
    sid = t.delete_where("k = 7")
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    for p, f in before.items():
        if f["bucket"] == target_bucket:
            assert p not in after
        else:
            assert after[p] == f
    assert rows(t.read()) == sorted(
        (i, "x", 1) for i in range(40) if i != 7
    )


def test_delete_where_can_empty_a_bucket_and_table(spark, tdir):
    t = make_table(spark, tdir, n_buckets=2)
    t.merge(batch(spark, [(1, "a", 1), (2, "b", 2)]))
    sid = t.delete_where("ver >= 1")
    assert t.read().count() == 0
    assert t.read().columns == ["k", "v", "ver"]  # schema-stable
    # and the table remains writable after full deletion
    t.merge(batch(spark, [(5, "z", 5)]))
    assert rows(t.read()) == [(5, "z", 5)]
    assert t.current_id() == sid + 1


def test_delete_where_crash_before_claim_leaves_old_snapshot(
    spark, tdir, monkeypatch
):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1), (2, "b", 2)]))
    pre = rows(t.read())

    def boom(manifest, new_id):
        raise OSError("injected crash before commit point")

    monkeypatch.setattr(t, "_claim", boom)
    with pytest.raises(OSError):
        t.delete_where("ver = 2")
    monkeypatch.undo()
    t2 = make_table(spark, tdir)  # cold handle, post-crash recovery
    assert t2.current_id() == 1
    assert rows(t2.read()) == pre
    # the failed attempt's staged files must not satisfy a later read
    sid = t2.delete_where("ver = 2")
    assert sid == 2
    assert rows(t2.read()) == [(1, "a", 1)]


def test_delete_where_cas_race_retries_on_new_base(
    spark, tdir, monkeypatch
):
    """Delete computed against snapshot 1 while a writer lands
    snapshot 2: the CAS must fail and the retry must re-plan on the
    winner's state — B's new matching row is deleted too."""
    t_a = make_table(spark, tdir)
    t_b = make_table(spark, tdir)
    t_a.merge(batch(spark, [(1, "a", 1), (2, "drop", 2)]))

    real_claim = t_a._claim
    state = {"raced": False}

    def racing_claim(manifest, new_id):
        if not state["raced"]:
            state["raced"] = True
            t_b.merge(batch(spark, [(3, "drop", 3)]))
        return real_claim(manifest, new_id)

    monkeypatch.setattr(t_a, "_claim", racing_claim)
    sid = t_a.delete_where("v = 'drop'")
    assert sid == 3  # lost the CAS on 2, retried and claimed 3
    assert rows(t_a.read()) == [(1, "a", 1)]


def test_delete_where_folds_append_duplicates_too(spark, tdir):
    """Merge-on-read contract: delete operates on ROWS, so appended
    duplicate rows matching the predicate all go."""
    t = make_table(spark, tdir, n_buckets=2)
    t.append(batch(spark, [(1, "a", 1), (2, "b", 1)]))
    t.append(batch(spark, [(1, "a", 1)]))  # at-least-once replay
    assert t.read().count() == 3
    t.delete_where("k = 1")
    assert rows(t.read()) == [(2, "b", 1)]


def test_delete_where_expire_reclaims_rewritten_files(spark, tdir):
    t = make_table(spark, tdir, n_buckets=2)
    t.merge(batch(spark, [(i, "x", i) for i in range(10)]))
    old_paths = {
        os.path.join(t.table_dir, f["path"])
        for f in t._manifest(1)["files"]
    }
    t.delete_where("ver >= 5")
    t.expire_snapshots(keep_last=1)
    gone = [p for p in old_paths if not os.path.exists(p)]
    assert gone  # superseded pre-delete files physically reclaimed
    assert rows(t.read()) == [(i, "x", i) for i in range(5)]


# ------------------------------------------------------------- update


def test_update_where_basic(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1), (2, "b", 2), (3, "c", 3)]))
    sid = t.update_where("ver >= 2", {"v": "upper(v) || '!'"})
    assert rows(t.read()) == [(1, "a", 1), (2, "B!", 2), (3, "C!", 3)]
    # pre-update snapshot is time-travel stable
    assert rows(t.read(snapshot_id=1)) == [
        (1, "a", 1), (2, "b", 2), (3, "c", 3),
    ]
    m = t._manifest(sid)
    assert m["operation"] == "update"
    assert m["properties"]["update.predicate"] == "ver >= 2"
    assert m["properties"]["update.columns"] == ["v"]


def test_update_where_rejects_frozen_and_unknown_columns(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="key/order/bucket"):
        t.update_where("ver = 1", {"k": "k + 1"})
    with pytest.raises(ValueError, match="key/order/bucket"):
        t.update_where("ver = 1", {"ver": "ver + 1"})
    with pytest.raises(ValueError, match="unknown"):
        t.update_where("ver = 1", {"nope": "1"})


def test_update_where_prunes_and_carries_by_reference(spark, tdir):
    t = make_table(spark, tdir, n_buckets=2)
    t.merge(batch(spark, [(i, "lo", i) for i in range(0, 20)]))
    t.merge(batch(spark, [(i, "hi", i) for i in range(200, 220)]))
    before = {f["path"]: f for f in t._manifest(t.current_id())["files"]}
    sid = t.update_where("ver BETWEEN 200 AND 299", {"v": "'HI'"})
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    for p, f in before.items():
        s = f["stats"]["ver"]
        if s[1] < 200:
            assert after[p] == f  # lo files untouched, same entries
        else:
            assert p not in after  # hi files rewritten
    assert rows(t.read()) == sorted(
        [(i, "lo", i) for i in range(0, 20)]
        + [(i, "HI", i) for i in range(200, 220)]
    )
    # no-match update is a no-op commit-wise
    assert t.update_where("ver > 10000", {"v": "'X'"}) == sid


def test_update_where_null_predicate_rows_pass_through(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(
        spark.createDataFrame(
            [(1, None, 1), (2, "x", 2)], "k long, v string, ver long"
        )
    )
    t.update_where("v = 'x'", {"v": "'y'"})
    assert rows(t.read()) == [(1, None, 1), (2, "y", 2)]


def test_update_where_cast_keeps_schema_stable(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1)]))
    t.update_where("ver = 1", {"v": "ver * 10"})  # long expr -> string col
    [r] = t.read().collect()
    assert r["v"] == "10" and isinstance(r["v"], str)
    assert t.read().schema["v"].dataType.simpleString() == "string"


# --------------------------------------------------------- delete_keys


def test_delete_keys_basic_and_nullsafe(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 2), (None, "n", 3), (4, "d", 4)],
            "k long, v string, ver long",
        )
    )
    keys = spark.createDataFrame([(2,), (None,), (99,)], "k long")
    sid = t.delete_keys(keys)
    assert rows(t.read()) == [(1, "a", 1), (4, "d", 4)]
    pre = {
        (r["k"], r["v"], r["ver"])
        for r in t.read(snapshot_id=1).collect()
    }
    assert pre == {
        (1, "a", 1), (2, "b", 2), (4, "d", 4), (None, "n", 3),
    }
    assert t._manifest(sid)["operation"] == "delete"


def test_delete_keys_prunes_to_key_buckets(spark, tdir, monkeypatch):
    """Only the requested keys' physical buckets may be read, and only
    buckets with an actual match may be rewritten."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(80)]))
    before = {f["path"]: f for f in t._manifest(t.current_id())["files"]}
    target_bucket = (
        batch(spark, [(7, "x", 1)])
        .select(F.pmod(F.hash("k"), F.lit(8)).alias("b"))
        .first()["b"]
    )
    opened = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        opened.extend(paths)
        return real_parquet(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    sid = t.delete_keys(spark.createDataFrame([(7,)], "k long"))
    monkeypatch.undo()
    data_opened = [p for p in opened if p.endswith(".parquet")]
    for p in data_opened:
        entry = next(f for f in before.values() if p.endswith(f["path"]))
        assert entry["bucket"] == target_bucket, f"wrong bucket read: {p}"
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    for p, f in before.items():
        if f["bucket"] == target_bucket:
            assert p not in after
        else:
            assert after[p] == f
    assert t.read().count() == 79


def test_delete_keys_no_match_is_noop(spark, tdir):
    t = make_table(spark, tdir)
    sid = t.merge(batch(spark, [(1, "a", 1)]))
    assert t.delete_keys(
        spark.createDataFrame([(42,)], "k long")
    ) == sid
    assert t.snapshot_ids() == [sid]


def test_delete_keys_requires_key_columns(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="missing key columns"):
        t.delete_keys(spark.createDataFrame([("x",)], "other string"))


def test_predicate_bounds_soundness_fuzz():
    """Soundness is the delete-correctness property: for ANY predicate
    the parser accepts, every row satisfying the predicate must fall
    inside the derived bounds (bounds are a RELAXATION — pruning a
    file whose stats sit outside them can never skip a matching row).
    Structured fuzz: random AND-chains of comparisons/BETWEENs/noise
    conjuncts (string equalities with AND/OR inside literals), random
    rows, an independent Python evaluator as ground truth."""
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    cols = ["a", "b", "c"]

    def evaluate(conj, row):
        kind = conj[0]
        if kind == "cmp":
            _, col, op, lit = conj
            v = row[col]
            return {
                "<": v < lit, "<=": v <= lit, ">": v > lit,
                ">=": v >= lit, "=": v == lit,
            }[op]
        if kind == "between":
            _, col, lo, hi = conj
            return lo <= row[col] <= hi
        if kind == "case":
            # CASE WHEN ... THEN 1 ELSE 1 END = 1 — TRUE for every row
            # regardless of the embedded comparison (ADVICE r11 shape)
            return True
        _, col, s = conj  # ("str", col, literal) on the string col
        return row["s"] == s

    def render(conj):
        kind = conj[0]
        if kind == "cmp":
            _, col, op, lit = conj
            return f"{col} {op} {lit}"
        if kind == "between":
            _, col, lo, hi = conj
            return f"{col} BETWEEN {lo} AND {hi}"
        if kind == "case":
            _, col, lit = conj
            return (
                f"CASE WHEN a AND {col} = {lit} AND b "
                f"THEN 1 ELSE 1 END = 1"
            )
        _, col, s = conj
        esc = s.replace("'", "''")
        return f"s = '{esc}'"

    conj_st = st.one_of(
        st.tuples(
            st.just("cmp"), st.sampled_from(cols),
            st.sampled_from(["<", "<=", ">", ">=", "="]),
            st.integers(-5, 5),
        ),
        st.tuples(
            st.just("between"), st.sampled_from(cols),
            st.integers(-5, 2), st.integers(-1, 5),
        ),
        st.tuples(
            st.just("str"), st.just("s"),
            st.sampled_from(["x", "a AND b", "a OR b", "it''s"]),
        ),
        st.tuples(
            st.just("case"), st.sampled_from(cols),
            st.integers(-5, 5),
        ),
    )

    @settings(max_examples=200, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(
        conjs=st.lists(conj_st, min_size=1, max_size=4),
        seed=st.integers(0, 10**6),
    )
    def check(conjs, seed):
        pred = " AND ".join(render(c) for c in conjs)
        bounds = predicate_bounds(pred)
        rng = random.Random(seed)
        for _ in range(20):
            row = {c: rng.randint(-6, 6) for c in cols}
            row["s"] = rng.choice(["x", "a AND b", "a OR b", "it''s", "y"])
            if all(evaluate(c, row) for c in conjs):
                for col, (lo, hi) in bounds.items():
                    assert lo <= row[col] <= hi, (
                        f"UNSOUND: {pred!r} bounds={bounds} row={row}"
                    )

    check()


def test_delete_keys_casts_probe_to_table_key_type(spark, tdir):
    """Review r11: Spark's hash is type-sensitive — an int-typed keys
    frame against a long-keyed table must still hash to the RIGHT
    buckets and delete (previously: silent non-deletion)."""
    t = make_table(spark, tdir, n_buckets=8)
    t.merge(batch(spark, [(i, "x", 1) for i in range(40)]))
    t.delete_keys(spark.createDataFrame([(7,), (11,)], "k int"))
    assert sorted(r["k"] for r in t.read().collect()) == [
        i for i in range(40) if i not in (7, 11)
    ]


def test_update_where_set_is_simultaneous(spark, tdir):
    """Review r11: SQL SET semantics — every assignment expression
    evaluates against the PRE-update row, so a swap swaps."""
    t = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=2,
    )
    t.merge(
        spark.createDataFrame(
            [(1, "A", "B", 1)], "k long, x string, y string, ver long"
        )
    )
    t.update_where("ver = 1", {"x": "y", "y": "x"})
    [r] = t.read().collect()
    assert (r["x"], r["y"]) == ("B", "A")


def test_update_where_rejects_empty_assignments(spark, tdir):
    t = make_table(spark, tdir)
    t.merge(batch(spark, [(1, "a", 1)]))
    with pytest.raises(ValueError, match="empty assignments"):
        t.update_where("ver = 1", {})


# ------------------------------------------------- string stats (r12)


def test_truncate_upper_forms():
    from turnover_odata_etl_spark.storage.snapshot import _truncate_upper

    MAX = chr(0x10FFFF)
    assert _truncate_upper("short") == "short"
    assert _truncate_upper("a" * 16) == "a" * 16  # exact at the edge
    assert _truncate_upper("a" * 17) == "a" * 15 + "b"
    assert _truncate_upper("abcdefghijklmnop" + "zzz") == "abcdefghijklmnoq"
    # positions at U+10FFFF are dropped, an earlier one increments
    assert _truncate_upper("ab" + MAX * 14 + "x") == "ac"
    # every kept position at the max: no finite upper bound
    assert _truncate_upper(MAX * 17) is None
    # the increment skips the surrogate block (not UTF-8-encodable)
    assert (
        _truncate_upper("a" * 15 + chr(0xD7FF) + "tail")
        == "a" * 15 + chr(0xE000)
    )


def test_stats_overlap_mixed_type_bounds_degrade_to_must_read(
    spark, tdir
):
    """ADVICE r12: a mixed-type public call like
    ``read_where('v', 'a', 5)`` must degrade to must-read at the
    prune layer (never raise ``str > int`` mid-pruning) — the
    predicate's own SQL semantics then apply downstream."""
    from turnover_odata_etl_spark.storage.snapshot import _stats_overlap

    # str column stats, str lo, int hi: the old lo-only guard passed
    # and `s_lo > hi` raised TypeError; now it must-read.
    assert _stats_overlap(["m", "t"], "a", 5) is True
    # the symmetric shape (int lo, str hi) must-reads too
    assert _stats_overlap(["m", "t"], 5, "a") is True
    # homogeneous calls still prune as before
    assert _stats_overlap(["m", "t"], "u", "z") is False
    assert _stats_overlap([10, 20], 30, 40) is False

    # end-to-end: the public call plans and executes without raising
    t = SnapshotTable(
        spark, os.path.join(tdir, "mixed"), key_cols=["k"],
        order_col="ver", n_buckets=2,
    )
    t.append(
        spark.createDataFrame(
            [(1, "apple", 1), (2, "pear", 1)], "k long, v string, ver long"
        )
    )
    t.read_where("v", "a", "z").collect()  # sanity: homogeneous
    # mixed bounds are refused at entry with a CLEAR error (never a
    # mid-prune `str > int` TypeError or an engine-side cast failure)
    with pytest.raises(TypeError, match="both"):
        t.read_where("v", "a", 5)


def test_string_stats_truncation_soundness_fuzz():
    """A pruned file can NEVER contain a match (VERDICT r11 item 3's
    Done criterion): for random file contents and random predicate
    intervals, if the truncated manifest stats report no overlap,
    brute force must confirm no file value lies in the interval."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from turnover_odata_etl_spark.storage.snapshot import (
        _stats_overlap,
        _truncate_upper,
    )

    # alphabet stresses every edge: '' ordering, multi-byte code
    # points, the maximum code point, surrogate-adjacent increments
    char = st.sampled_from(["a", "b", "z", "é", chr(0xD7FF), chr(0x10FFFF)])
    word = st.text(alphabet=char, min_size=0, max_size=24)

    @settings(max_examples=300, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(values=st.lists(word, min_size=1, max_size=8),
           lo=word, hi=word)
    def check(values, lo, hi):
        stats = [min(values)[:16], _truncate_upper(max(values))]
        if not _stats_overlap(stats, lo, hi):
            for v in values:
                assert not (lo <= v <= hi), (
                    f"UNSOUND prune: stats={stats!r} bounds=({lo!r}, "
                    f"{hi!r}) hides match {v!r}"
                )
        # equality probe: every stored value must survive its own
        # point lookup through the truncated stats
        for v in values:
            assert _stats_overlap(stats, v, v), (
                f"UNSOUND: {v!r} invisible through stats={stats!r}"
            )

    check()


def test_delete_where_prunes_files_by_string_stats(
    spark, tdir, monkeypatch
):
    """The round-11 SCALE.md measurement to beat: a string-equality
    delete opened 16/16 candidates. With truncation-aware string
    stats the prune must keep non-overlapping files CLOSED (spy) and
    carried BY REFERENCE, while the delete stays exact."""
    t = make_table(spark, tdir, n_buckets=2)
    t.merge(batch(spark, [(i, "apple", i) for i in range(0, 20)]))
    t.merge(batch(spark, [(i, "click", i) for i in range(100, 120)]))
    t.merge(batch(spark, [(i, "zebra", i) for i in range(200, 220)]))
    base = t.current_id()
    before = {f["path"]: f for f in t._manifest(base)["files"]}
    assert all("v" in (f.get("stats") or {}) for f in before.values())

    opened: list[str] = []
    real_parquet = type(spark.read).parquet

    def spy(reader, *paths):
        opened.extend(paths)
        return real_parquet(reader, *paths)

    monkeypatch.setattr(type(spark.read), "parquet", spy)
    sid = t.delete_where("v = 'click'")
    monkeypatch.undo()

    assert rows(t.read()) == sorted(
        [(i, "apple", i) for i in range(0, 20)]
        + [(i, "zebra", i) for i in range(200, 220)]
    )
    # only click-range files were opened by the candidate read
    for p in [p for p in opened if p.endswith(".parquet")]:
        entry = next(f for f in before.values() if p.endswith(f["path"]))
        s = entry["stats"]["v"]
        assert not (s[1] < "click" or s[0] > "click"), (
            f"pruned file opened: {p}"
        )
    # apple/zebra files carried by reference
    after = {f["path"]: f for f in t._manifest(sid)["files"]}
    for p, f in before.items():
        s = f["stats"]["v"]
        if s[1] < "click" or s[0] > "click":
            assert after[p] == f
        else:
            assert p not in after  # rewritten away


def test_string_stats_truncated_in_manifest_and_delete_exact(
    spark, tdir
):
    """Long strings store 16-code-point truncated bounds (lower =
    prefix, upper = incremented prefix) and predicate deletes through
    them stay exact."""
    long_lo = "aaaaaaaaaaaaaaaaZZZ"  # 16 a's + tail
    long_hi = "zzzzzzzzzzzzzzzzAAA"
    t = make_table(spark, tdir, n_buckets=1)
    t.merge(
        spark.createDataFrame(
            [(1, long_lo, 1), (2, long_hi, 2), (3, "mid", 3)],
            "k long, v string, ver long",
        )
    )
    (f,) = t._manifest(t.current_id())["files"]
    s = f["stats"]["v"]
    assert s[0] == "a" * 16  # truncated prefix lower
    assert s[1] == "z" * 15 + "{"  # incremented truncated upper
    # a no-overlap point predicate proves a no-op WITHOUT reading
    sid = t.current_id()
    assert t.delete_where("v = '" + chr(0x10FFFF) + "'") == sid
    # deleting a long value through truncated stats stays exact
    t.delete_where(f"v = '{long_lo}'")
    assert [r["k"] for r in t.read().orderBy("k").collect()] == [2, 3]
