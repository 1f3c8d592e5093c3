"""Field-id schema evolution (round 16 — SURVEY E126): rename /
drop / widen as METADATA-ONLY commits on SnapshotTable, the Iceberg
v2 mechanism re-expressed Spark-first (stable field ids in
StructField metadata, name-lineage reads, Spark 4 widening parquet
reads). Reference parity note: the reference ETL (src/etl.py) has no
schema evolution at all — this is extension surface; the public
patterns are the Iceberg spec's "Schema Evolution" section and Delta
Lake column mapping.

Covers the VERDICT r15 item-2 Done list: metadata-only semantics
(zero data rewrite), whole-history reads through renames/widens,
time travel with each snapshot's own schema, crash injection both
sides of the commit point, CAS races (evolve vs data, evolve vs
evolve, data rebase refusing across an evolve), and the
reserved-name guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from turnover_odata_etl_spark.storage import SnapshotTable
from turnover_odata_etl_spark.storage.snapshot import CommitConflict


@pytest.fixture()
def tdir(tmp_path):
    return str(tmp_path / "tbl")


def mk(spark, tdir, **kw):
    kw.setdefault("n_buckets", 4)
    return SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", **kw
    )


def b(spark, rows, schema="k long, ver long, value int"):
    return spark.createDataFrame(rows, schema)


def data_paths(t):
    return sorted(
        os.path.join(t.table_dir, f["path"])
        for f in t._manifest(t.current_id())["files"]
    )


def test_rename_is_metadata_only_and_reads_whole_history(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10), (2, 1, 20)]))
    before = data_paths(t)
    before_mtimes = {p: os.path.getmtime(p) for p in before}
    sid = t.rename_column("value", "amount")
    assert sid == 2
    # zero data files rewritten, none added
    assert data_paths(t) == before
    assert {p: os.path.getmtime(p) for p in before} == before_mtimes
    t.append(
        b(spark, [(3, 1, 30)], "k long, ver long, amount int")
    )
    got = sorted((r["k"], r["amount"]) for r in t.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    assert t.read().columns == ["k", "ver", "amount"]


def test_widen_is_metadata_only_and_old_files_upcast(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    before = data_paths(t)
    t.widen_column("value", "long")
    assert data_paths(t) == before
    assert isinstance(t.read().schema["value"].dataType, T.LongType)
    t.append(
        b(spark, [(2, 1, 2**40)], "k long, ver long, value long")
    )
    got = sorted((r["k"], r["value"]) for r in t.read().collect())
    assert got == [(1, 10), (2, 2**40)]


def test_float_to_double_widen(spark, tdir):
    t = mk(spark, tdir)
    t.append(
        b(spark, [(1, 1, 1.5)], "k long, ver long, x float")
    )
    t.widen_column("x", "double")
    assert isinstance(t.read().schema["x"].dataType, T.DoubleType)
    assert t.read().collect()[0]["x"] == 1.5


def test_full_lifecycle_with_time_travel_and_fresh_load(spark, tdir):
    """append → widen → append → rename → append: the current read
    resolves the whole history under the final schema; time travel
    reads EACH snapshot with its own (narrower, older-named) schema;
    a cold ``load`` adopts the evolved config."""
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))            # sid 1: value int
    t.widen_column("value", "long")             # sid 2
    t.append(
        b(spark, [(2, 1, 20)], "k long, ver long, value long")
    )                                           # sid 3
    t.rename_column("value", "amount")          # sid 4
    t.append(
        b(spark, [(3, 1, 30)], "k long, ver long, amount long")
    )                                           # sid 5
    got = sorted((r["k"], r["amount"]) for r in t.read().collect())
    assert got == [(1, 10), (2, 20), (3, 30)]
    # time travel: pre-rename snapshot keeps the OLD name + both rows
    tt = t.read(snapshot_id=3)
    assert tt.columns == ["k", "ver", "value"]
    assert sorted((r["k"], r["value"]) for r in tt.collect()) == [
        (1, 10), (2, 20),
    ]
    # pre-widen snapshot keeps the NARROW type
    t1 = t.read(snapshot_id=1)
    assert isinstance(t1.schema["value"].dataType, T.IntegerType)
    # cold open resolves everything from the manifests
    t2 = SnapshotTable.load(spark, tdir)
    assert sorted(
        (r["k"], r["amount"]) for r in t2.read().collect()
    ) == got
    assert t2._last_fid == 3


def test_rename_key_order_bucket_cols_moves_config(spark, tdir):
    t = mk(spark, tdir, bloom_cols=[])
    t.merge(b(spark, [(1, 1, 10), (2, 1, 20)]))
    t.rename_column("k", "id")
    t.rename_column("ver", "rev")
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.key_cols == ["id"] and t2.order_col == "rev"
    assert t2.bucket_cols == ["id"]
    # keyed verbs keep working under the new names (same physical
    # layout — bucket hashes are value-based)
    t2.merge(
        spark.createDataFrame(
            [(1, 2, 11)], "id long, rev long, value int"
        )
    )
    got = {r["id"]: r["value"] for r in t2.read().collect()}
    assert got == {1: 11, 2: 20}
    t2.delete_keys(spark.createDataFrame([(2,)], "id long"))
    assert {r["id"] for r in t2.read().collect()} == {1}


def test_rename_back_to_own_former_name_is_allowed(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    t.rename_column("value", "amount")
    t.append(
        b(spark, [(2, 1, 20)], "k long, ver long, amount int")
    )
    t.rename_column("amount", "value")  # same field id — same data
    got = sorted((r["k"], r["value"]) for r in t.read().collect())
    assert got == [(1, 10), (2, 20)]


def test_drop_column_and_reserved_name_guard(spark, tdir):
    t = mk(spark, tdir)
    t.append(
        b(
            spark,
            [(1, 1, 10, "x")],
            "k long, ver long, value int, note string",
        )
    )
    before = data_paths(t)
    t.drop_column("note")
    assert data_paths(t) == before  # metadata-only
    assert t.read().columns == ["k", "ver", "value"]
    # time travel still shows the dropped column
    assert "note" in t.read(snapshot_id=1).columns
    # reuse of the retired name via append evolution is refused —
    # old files still carry those bytes
    with pytest.raises(ValueError, match="reserved"):
        t.append(
            b(
                spark,
                [(2, 1, 20, "y")],
                "k long, ver long, value int, note string",
            )
        )
    # ...and via rename
    with pytest.raises(ValueError, match="reserved"):
        t.rename_column("value", "note")
    # an unrelated new column is fine and gets a fresh fid
    t.append(
        b(
            spark,
            [(2, 1, 20, 5)],
            "k long, ver long, value int, extra long",
        )
    )
    assert t.read().columns == ["k", "ver", "value", "extra"]


def test_prior_name_reuse_refused_across_fields(spark, tdir):
    """After value→amount, a NEW column may not be called "value":
    pre-rename files physically carry that column and the lineage
    read would surface the old field's bytes as the new field's."""
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    t.rename_column("value", "amount")
    with pytest.raises(ValueError, match="reserved"):
        t.append(
            b(
                spark,
                [(2, 1, 20, 7)],
                "k long, ver long, amount int, value int",
            )
        )


def test_evolution_refusals(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    with pytest.raises(ValueError, match="key/order/bucket"):
        t.drop_column("k")
    with pytest.raises(ValueError, match="bucket column"):
        t.widen_column("k", "long")  # k IS long already, but bucket
    with pytest.raises(ValueError, match="not a supported widening"):
        t.widen_column("value", "short")  # int -> short narrows
    with pytest.raises(ValueError, match="unsupported target"):
        t.widen_column("value", "string")
    with pytest.raises(ValueError, match="no column"):
        t.rename_column("nope", "x")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("value", "ver")
    with pytest.raises(ValueError, match="invalid target"):
        t.rename_column("value", "value")


def test_evolve_crash_before_claim_leaves_old_schema(
    spark, tdir, monkeypatch
):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))

    def boom(*a, **kw):
        raise OSError("injected crash before commit point")

    monkeypatch.setattr(t, "_claim", boom)
    with pytest.raises(OSError, match="injected"):
        t.rename_column("value", "amount")
    monkeypatch.undo()
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.current_id() == 1
    assert t2.read().columns == ["k", "ver", "value"]
    t2.rename_column("value", "amount")  # recovery: clean retry
    assert t2.read().columns == ["k", "ver", "amount"]


def test_evolve_crash_after_claim_rolls_forward(
    spark, tdir, monkeypatch
):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))

    def boom(sid):
        raise OSError("injected crash after commit point")

    monkeypatch.setattr(t, "_write_pointer", boom)
    with pytest.raises(OSError, match="injected"):
        t.rename_column("value", "amount")
    monkeypatch.undo()
    t2 = SnapshotTable.load(spark, tdir)
    assert t2.current_id() == 2  # claim IS the commit point
    assert t2.read().columns == ["k", "ver", "amount"]


def test_evolve_replans_when_data_commit_wins_the_race(
    spark, tdir, monkeypatch
):
    """An evolution that loses the claim CAS re-derives its schema
    from the winner's head and lands on top — both effects hold."""
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(b(spark, [(1, 1, 10)]))

    state = {"armed": True}
    orig = SnapshotTable._claim

    def racing(self, manifest, new_id):
        if state["armed"] and self is t1:
            state["armed"] = False
            t2.append(b(spark, [(2, 1, 20)]))
        return orig(self, manifest, new_id)

    monkeypatch.setattr(SnapshotTable, "_claim", racing)
    t1.rename_column("value", "amount")
    monkeypatch.setattr(SnapshotTable, "_claim", orig)
    got = sorted((r["k"], r["amount"]) for r in t1.read().collect())
    assert got == [(1, 10), (2, 20)]
    assert t1.current_id() == 3


def test_data_rebase_refuses_across_a_winning_evolution(
    spark, tdir, monkeypatch
):
    """The fid-aware schema guard: an append that loses its claim to
    a RENAME must NOT rebase (its manifest would revert the rename).
    It re-plans — and because its batch still carries the OLD name,
    the re-plan's additive evolution hits the reserved-name guard
    and fails LOUDLY instead of silently forking the column (the
    Iceberg behavior: a concurrent rename invalidates old-schema
    writers; the application re-sends under the new name)."""
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(b(spark, [(1, 1, 10)]))

    state = {"armed": True}
    orig = SnapshotTable._claim

    def racing(self, manifest, new_id):
        if state["armed"] and self is t1:
            state["armed"] = False
            t2.rename_column("value", "amount")
        return orig(self, manifest, new_id)

    monkeypatch.setattr(SnapshotTable, "_claim", racing)
    with pytest.raises(ValueError, match="reserved"):
        t1.append(b(spark, [(2, 1, 20)]))
    monkeypatch.setattr(SnapshotTable, "_claim", orig)
    # the rename landed intact; re-sending under the NEW name works
    t3 = SnapshotTable.load(spark, tdir)
    assert t3.read().columns == ["k", "ver", "amount"]
    t3.append(
        b(spark, [(2, 1, 20)], "k long, ver long, amount int")
    )
    got = sorted((r["k"], r["amount"]) for r in t3.read().collect())
    assert got == [(1, 10), (2, 20)]


def test_two_evolutions_race_both_land(spark, tdir, monkeypatch):
    t1 = mk(spark, tdir)
    t2 = mk(spark, tdir)
    t1.append(
        b(
            spark,
            [(1, 1, 10, 1.5)],
            "k long, ver long, value int, x float",
        )
    )

    state = {"armed": True}
    orig = SnapshotTable._claim

    def racing(self, manifest, new_id):
        if state["armed"] and self is t1:
            state["armed"] = False
            t2.widen_column("x", "double")
        return orig(self, manifest, new_id)

    monkeypatch.setattr(SnapshotTable, "_claim", racing)
    t1.rename_column("value", "amount")
    monkeypatch.setattr(SnapshotTable, "_claim", orig)
    t3 = SnapshotTable.load(spark, tdir)
    assert t3.read().columns == ["k", "ver", "amount", "x"]
    assert isinstance(t3.read().schema["x"].dataType, T.DoubleType)
    assert t3.current_id() == 3


def test_cdc_is_transparent_across_a_rename(spark, tdir):
    """The evolve commit itself is an empty change set (no file
    moved), and a CDC window SPANNING the rename emits rows under
    the TO snapshot's names — old files resolve through lineage."""
    t = mk(spark, tdir)
    t.merge(b(spark, [(1, 1, 10)]))          # sid 1
    t.rename_column("value", "amount")       # sid 2
    assert t.changes(1, 2).count() == 0
    t.merge(
        spark.createDataFrame(
            [(1, 2, 11), (2, 1, 20)], "k long, ver long, amount int"
        )
    )                                         # sid 3
    ch = t.changes(1, 3)
    assert "amount" in ch.columns
    got = sorted(
        (r["k"], r["amount"], r["_change_type"]) for r in ch.collect()
    )
    assert got == [(1, 11, "update"), (2, 20, "insert")]


def test_merge_into_and_pruned_reads_after_rename(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10), (2, 1, 20)]))
    t.rename_column("value", "amount")
    t.merge_into(
        spark.createDataFrame(
            [(2, 2, 99), (3, 1, 30)], "k long, ver long, amount int"
        )
    )
    got = {r["k"]: r["amount"] for r in t.read().collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    # key-pruned and predicate reads under the new name; old files
    # (no stats under the new name) read conservatively — values
    # still resolve through the lineage
    assert {r["k"] for r in t.read_keys([2]).collect()} == {2}
    assert sorted(
        r["k"] for r in t.read_pred("amount >= 30").collect()
    ) == [2, 3]


def test_compact_after_rename_rewrites_under_new_name(spark, tdir):
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    t.append(b(spark, [(1, 2, 11)]))
    t.rename_column("value", "amount")
    t.compact(min_files=2, dedup_keys=True)
    got = [(r["k"], r["amount"]) for r in t.read().collect()]
    assert got == [(1, 11)]
    # the rewritten files carry stats under the CURRENT name —
    # stat pruning recovers after compaction
    ents = t._manifest(t.current_id())["files"]
    assert any("amount" in (f.get("stats") or {}) for f in ents)


def test_never_evolved_tables_keep_bare_column_plans(spark, tdir):
    """The lineage fast path: without priors the projection is a
    bare column list — no coalesce in the plan, identical scans for
    every pre-evolution table."""
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "coalesce" not in plan.lower()
    t.rename_column("value", "amount")
    plan2 = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "coalesce" in plan2.lower()


def test_legacy_table_upgrades_on_first_evolution(spark, tdir):
    """A table whose manifests predate fid tracking (simulated by
    stripping the fid metadata) is upgraded by its first evolution
    commit — ids assigned in declaration order."""
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    # simulate a pre-r16 manifest: no fids, no last_fid
    import json as _json

    sid = t.current_id()
    raw = dict(t._manifest_raw(sid))
    st = T.StructType.fromJson(_json.loads(raw["schema"]))
    raw["schema"] = T.StructType(
        [T.StructField(f.name, f.dataType, f.nullable) for f in st]
    ).json()
    raw.pop("last_fid", None)
    path = os.path.join(t._manifest_dir, t._mname(sid))
    with open(path, "w") as fh:
        _json.dump(raw, fh)
    t2 = SnapshotTable.load(spark, tdir)
    assert t2._last_fid == 0
    t2.rename_column("value", "amount")
    t3 = SnapshotTable.load(spark, tdir)
    assert t3._last_fid == 3
    assert sorted(
        (r["k"], r["amount"]) for r in t3.read().collect()
    ) == [(1, 10)]


# ---------------------------------------------------------------------
# Round-16 review regressions (the /code-review pass on the round
# diff): publish must carry the evolution state, whole-table rewrites
# reclaim the name machinery coherently, and handle-vs-manifest
# key-config mismatches resolve through the rename lineage or refuse.


def test_publish_preserves_evolution_state(spark, tdir):
    """CONFIRMED review repro: the squash publish built through a
    COLD main handle dropped last_fid/retired, silently disabling
    the reserved-name guard — a later append reusing a dropped name
    then resurrected the dropped column's bytes. The publish must
    adopt the branch head's evolution state."""
    t = mk(spark, tdir)
    t.append(
        b(
            spark,
            [(1, 1, 10, "F")],
            "k long, ver long, value int, flag string",
        )
    )
    t.drop_column("flag")
    t2 = SnapshotTable(  # cold handle — empty in-memory state
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
    )
    br = t2.create_branch("wap")
    br.append(b(spark, [(2, 1, 20)]))
    br.publish()
    t3 = SnapshotTable.load(spark, tdir)
    assert t3._last_fid >= 4
    assert "flag" in t3._retired
    with pytest.raises(ValueError, match="reserved"):
        t3.append(
            b(
                spark,
                [(3, 1, 30, "NEW")],
                "k long, ver long, value int, flag string",
            )
        )


def test_overwrite_reclaims_retired_names_and_keeps_fids(spark, tdir):
    """A whole-table rewrite leaves no pre-rewrite file, so the
    retired registry and prior lineages are RECLAIMED in the same
    commit — and surviving columns keep their field ids by name
    (review r16: a stale retired entry next to a re-created live
    column contradicted the schema)."""
    t = mk(spark, tdir)
    t.append(
        b(
            spark,
            [(1, 1, 10, "x")],
            "k long, ver long, value int, note string",
        )
    )
    t.rename_column("value", "amount")
    t.drop_column("note")
    fid_before = {
        f.name: (f.metadata or {}).get("fid")
        for f in t.read().schema.fields
    }
    # whole-table rewrite (current schema — overwrite refuses new
    # columns by contract): no pre-rewrite file survives
    t.overwrite(
        b(spark, [(1, 2, 11)], "k long, ver long, amount int")
    )
    t2 = SnapshotTable.load(spark, tdir)
    assert t2._retired == {}
    fid_after = {
        f.name: (f.metadata or {}).get("fid")
        for f in t2.read().schema.fields
    }
    for name in ("k", "ver", "amount"):  # survivors keep their ids
        assert fid_after[name] == fid_before[name], name
    # and priors are gone: no coalesce left in the read plan
    plan = t2.read()._jdf.queryExecution().executedPlan().toString()
    assert "coalesce" not in plan.lower()
    # the retired name is RECLAIMED: appendable again (the stale
    # registry would have refused this forever)
    t2.append(
        b(
            spark,
            [(2, 3, 20, "y")],
            "k long, ver long, amount int, note string",
        )
    )
    got = sorted(
        (r["k"], r["amount"], r["note"]) for r in t2.read().collect()
    )
    assert got == [(1, 11, None), (2, 20, "y")]


def test_stale_named_handle_writes_after_key_rename(spark, tdir):
    """A handle constructed with the PRE-rename key/order names must
    accept correctly-named batches (adoption resolves the names
    through the rename lineage BEFORE validation — review r16)."""
    t = mk(spark, tdir)
    t.append(b(spark, [(1, 1, 10)]))
    t.rename_column("k", "id")
    stale = SnapshotTable(  # still says key_cols=["k"]
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
    )
    stale.append(
        spark.createDataFrame(
            [(2, 1, 20)], "id long, ver long, value int"
        )
    )
    got = sorted(r["id"] for r in stale.read().collect())
    assert got == [1, 2]
    keys = spark.createDataFrame([(1,)], "id long")
    stale2 = SnapshotTable(
        spark, tdir, key_cols=["k"], order_col="ver", n_buckets=4,
    )
    stale2.delete_keys(keys)
    assert [r["id"] for r in stale2.read().collect()] == [2]


def test_rekeying_handle_refuses_loudly(spark, tdir):
    """A handle whose key list names DIFFERENT fields than the
    manifest is a re-keying attempt — never a supported write path;
    pre-r16 it silently re-keyed, silent adoption would silently
    ignore it (and keep-latest would collapse on the wrong keys) —
    it must refuse (review r16)."""
    t = mk(spark, tdir)
    t.merge(b(spark, [(1, 1, 10)]))
    wrong = SnapshotTable(
        spark, tdir, key_cols=["k", "value"], order_col="ver",
        n_buckets=4,
    )
    with pytest.raises(ValueError, match="re-keying"):
        wrong.merge(b(spark, [(1, 2, 11)]))
