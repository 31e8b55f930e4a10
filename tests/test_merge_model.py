"""Model-based randomized testing of the MERGE table: a seeded random
sequence of table operations runs against BOTH the real engine and a
driver-side dict model; after every commit the live snapshot must equal
the model, every historical version must still time-travel to its
model snapshot, and at the end the change feed must replay snapshot(0)
into the final state. This catches interaction bugs no single-feature
test does (a deletion vector surviving a restore, a CDF row missed by
an update that followed a compact, ...).

Ops are weighted toward the mutating paths; compact() is the physical
no-op that must never change logical state. Each seed commits ~12
versions; 4 seeds keep the suite under ~2 minutes at local[32]."""

import random

import pytest
from pyspark.sql import functions as F

from hbase_to_mongo_export_spark.operators.merge import (
    ParquetMergeTable,
    src,
)

KEYSPACE = 60


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, n, a) for k, (n, a) in sorted(rows.items())],
        "id bigint, name string, amount double",
    )


def _snap(table, version=None):
    return {
        r["id"]: (r["name"], r["amount"])
        for r in table.read(version=version).collect()
    }


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_op_sequences_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    model = {k: (f"n{k}", float(k)) for k in range(0, KEYSPACE, 2)}
    t = ParquetMergeTable(spark, str(tmp_path / f"tbl{seed}"))
    t.create(_df(spark, model).repartitionByRange(4, F.col("id")))
    history = [dict(model)]  # model snapshot per committed version

    def do_merge():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 8))
        delta = {k: (f"m{k}_{len(history)}", rng.uniform(-100, 100)) for k in ks}
        t.merge(
            _df(spark, delta),
            on=["id"],
            when_matched_update={"name": src("name"), "amount": src("amount")},
        )
        model.update(delta)

    def do_delete():
        mod, rem = rng.randint(3, 9), rng.randint(0, 2)
        t.delete_where(F.col("id") % mod == rem)
        for k in [k for k in model if k % mod == rem]:
            del model[k]

    def do_update():
        cut = rng.randint(0, KEYSPACE)
        bump = float(rng.randint(1, 50))
        t.update_where(
            F.col("id") >= cut, {"amount": F.col("amount") + F.lit(bump)}
        )
        for k in [k for k in model if k >= cut]:
            model[k] = (model[k][0], model[k][1] + bump)

    def do_append():
        base = KEYSPACE + len(history) * 100
        rows = {base + i: (f"a{base + i}", 1.0) for i in range(rng.randint(1, 4))}
        t.append(_df(spark, rows))
        model.update(rows)

    def do_compact():
        if rng.random() < 0.5:
            t.compact(target_files=rng.randint(1, 4))
        else:
            t.compact(sort_col="id", target_files=rng.randint(2, 4))

    def do_restore():
        if len(history) < 2:  # nothing earlier to restore yet
            return do_compact()
        # strictly earlier: restore(current) is a documented no-op that
        # does NOT commit, which would break the op↔version alignment
        v = rng.randrange(len(history) - 1)
        t.restore(v)
        model.clear()
        model.update(history[v])

    def do_merge_by_source():
        # the sync shape: matched update + by-source delete/update with
        # target-only conditions (insert toggles randomly) — the model
        # applies the same clause ladder: delete first, then update
        ks = rng.sample(range(KEYSPACE), rng.randint(4, 16))
        delta = {k: (f"s{k}_{len(history)}", rng.uniform(-100, 100)) for k in ks}
        cut = rng.uniform(-100, 100)
        mark = f"bs{len(history)}"
        do_insert = rng.random() < 0.5
        t.merge(
            _df(spark, delta),
            on=["id"],
            when_matched_update={"name": src("name"), "amount": src("amount")},
            insert_not_matched=do_insert,
            when_not_matched_by_source_delete=F.col("amount") < cut,
            when_not_matched_by_source_update={"name": F.lit(mark)},
        )
        for k in list(model):
            if k in delta:
                model[k] = delta[k]
            elif model[k][1] < cut:
                del model[k]
            else:
                model[k] = (mark, model[k][1])
        if do_insert:
            model.update({k: v for k, v in delta.items() if k not in model})

    ops = [do_merge, do_delete, do_update, do_append, do_compact,
           do_restore, do_merge_by_source]
    weights = [4, 3, 3, 2, 2, 1, 3]
    for _ in range(12):
        rng.choices(ops, weights=weights, k=1)[0]()
        history.append(dict(model))
        assert t.current_version() == len(history) - 1, "op/version slip"
        assert _snap(t) == model, f"live state diverged at v{len(history) - 1}"

    # every retained version still time-travels to its model snapshot
    for v, snap in enumerate(history):
        assert _snap(t, version=v) == snap, f"time travel diverged at v{v}"

    # CDF replay: snapshot(0) + feed == final state (sequential,
    # full-row multiset — the invariant every incremental consumer runs)
    cols = ["id", "name", "amount"]
    feed = t.read_changes(from_version=1)
    rebuilt = t.read(version=0)
    for v in range(1, t.current_version() + 1):
        f = feed.filter(F.col("_commit_version") == v)
        removed = f.filter(
            F.col("_change_type").isin("update_preimage", "delete")
        ).select(*cols)
        added = f.filter(
            F.col("_change_type").isin("update_postimage", "insert")
        ).select(*cols)
        rebuilt = rebuilt.exceptAll(removed).unionByName(added)
    got = {r["id"]: (r["name"], r["amount"]) for r in rebuilt.collect()}
    assert got == model, "CDF replay diverged from final state"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [10, 11])
def test_random_ops_with_renames_match_model(spark, tmp_path, seed):
    """Same model net with RENAME COLUMN woven through the sequence:
    every subsequent merge/update/append/delete must resolve the
    renamed column, restore must bring back the OLD name with the old
    rows, and time travel must show each version under the name it had
    then."""
    rng = random.Random(seed)
    model = {k: (f"n{k}", float(k)) for k in range(0, KEYSPACE, 2)}
    amt = "amount"  # current logical name of the amount column
    t = ParquetMergeTable(spark, str(tmp_path / f"tbl{seed}"))
    t.create(
        spark.createDataFrame(
            [(k, n, a) for k, (n, a) in sorted(model.items())],
            f"id bigint, name string, {amt} double",
        ).repartitionByRange(4, F.col("id"))
    )
    history = [(dict(model), amt)]

    def df_of(rows, amt_name):
        return spark.createDataFrame(
            [(k, n, a) for k, (n, a) in sorted(rows.items())],
            f"id bigint, name string, {amt_name} double",
        )

    def snap(version=None):
        a = amt if version is None else history[version][1]
        return {
            r["id"]: (r["name"], r[a])
            for r in t.read(version=version).collect()
        }

    def do_merge():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        delta = {k: (f"m{k}_{len(history)}", rng.uniform(-9, 9)) for k in ks}
        t.merge(
            df_of(delta, amt),
            on=["id"],
            when_matched_update={"name": src("name"), amt: src(amt)},
        )
        model.update(delta)

    def do_rename():
        nonlocal amt
        new = f"amt_{len(history)}"
        t.rename_column(amt, new)
        amt = new

    def do_delete():
        mod, rem = rng.randint(3, 9), rng.randint(0, 2)
        t.delete_where(F.col("id") % mod == rem)
        for k in [k for k in model if k % mod == rem]:
            del model[k]

    def do_update():
        cut, bump = rng.randint(0, KEYSPACE), float(rng.randint(1, 9))
        t.update_where(
            [("id", ">=", cut)], {amt: F.col(amt) + F.lit(bump)}
        )
        for k in [k for k in model if k >= cut]:
            model[k] = (model[k][0], model[k][1] + bump)

    def do_restore():
        nonlocal amt
        if len(history) < 2:
            return do_merge()
        v = rng.randrange(len(history) - 1)
        t.restore(v)
        rows, amt = history[v]
        model.clear()
        model.update(rows)

    ops = [do_merge, do_rename, do_delete, do_update, do_restore]
    weights = [4, 2, 2, 3, 1]
    for _ in range(10):
        rng.choices(ops, weights=weights, k=1)[0]()
        history.append((dict(model), amt))
        assert t.current_version() == len(history) - 1, "op/version slip"
        assert snap() == model
        assert t.read().columns == ["id", "name", amt]

    for v, (rows, a) in enumerate(history):
        assert t.read(version=v).columns == ["id", "name", a], f"v{v} cols"
        assert snap(version=v) == rows, f"time travel diverged at v{v}"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [20, 21])
def test_random_ops_with_type_widening_match_model(spark, tmp_path, seed):
    """The model net with TYPE WIDENING woven through the sequence: the
    table starts NARROW (id int, amount float); widening ops arrive
    mid-sequence via wide merges/appends; every later narrow write
    upcasts; restore can rewind PAST a widening (schema reverts) and
    the sequence re-widens. All amounts stay integral-valued so
    float32↔float64 promotion is exact and the model dict (Python
    floats) compares bit-clean against both representations."""
    rng = random.Random(seed)
    model = {k: (f"n{k}", float(k)) for k in range(0, KEYSPACE, 2)}
    t = ParquetMergeTable(spark, str(tmp_path / f"tbl{seed}"))
    t.create(
        spark.createDataFrame(
            [(k, n, a) for k, (n, a) in sorted(model.items())],
            "id int, name string, amount float",
        ).repartitionByRange(4, F.col("id"))
    )
    history = [dict(model)]

    def df_of(rows, ddl):
        return spark.createDataFrame(
            [(k, n, a) for k, (n, a) in sorted(rows.items())], ddl
        )

    def snap(version=None):
        return {
            r["id"]: (r["name"], float(r["amount"]))
            for r in t.read(version=version).collect()
        }

    def do_merge_narrow():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        delta = {k: (f"m{k}_{len(history)}", float(rng.randint(-99, 99))) for k in ks}
        t.merge(
            df_of(delta, "id int, name string, amount float"),
            on=["id"],
            when_matched_update={"name": src("name"), "amount": src("amount")},
        )
        model.update(delta)

    def do_merge_widen():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        delta = {k: (f"w{k}_{len(history)}", float(rng.randint(-99, 99))) for k in ks}
        t.merge(
            df_of(delta, "id bigint, name string, amount double"),
            on=["id"],
            when_matched_update={"name": src("name"), "amount": src("amount")},
            schema_evolution=True,
        )
        model.update(delta)

    def do_append_wide():
        base = KEYSPACE + len(history) * 100
        rows = {base + i: (f"a{base + i}", 2.0) for i in range(rng.randint(1, 3))}
        t.append(
            df_of(rows, "id bigint, name string, amount double"),
            schema_evolution=True,
        )
        model.update(rows)

    def do_delete():
        mod, rem = rng.randint(3, 9), rng.randint(0, 2)
        t.delete_where(F.col("id") % mod == rem)
        for k in [k for k in model if k % mod == rem]:
            del model[k]

    def do_compact():
        t.compact(target_files=rng.randint(1, 4))

    def do_restore():
        if len(history) < 2:
            return do_merge_narrow()
        v = rng.randrange(len(history) - 1)
        t.restore(v)
        model.clear()
        model.update(history[v])

    ops = [do_merge_narrow, do_merge_widen, do_append_wide, do_delete,
           do_compact, do_restore]
    weights = [3, 3, 2, 2, 1, 1]
    for _ in range(12):
        rng.choices(ops, weights=weights, k=1)[0]()
        history.append(dict(model))
        assert t.current_version() == len(history) - 1, "op/version slip"
        assert snap() == model, f"live state diverged at v{len(history) - 1}"

    # time travel must still match the model AT EVERY VERSION — including
    # the pre-widening snapshots read under their narrow schema
    for v, s in enumerate(history):
        assert snap(version=v) == s, f"time travel diverged at v{v}"


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_random_ops_with_nested_evolution_match_model(spark, tmp_path, seed):
    """The model net with NESTED schema evolution woven through the
    sequence: the table starts with ``s struct<x:int,y:string>``;
    evolving merges/appends arrive mid-sequence with the struct WIDENED
    (x int→bigint) and EXTENDED (new field z); later narrow writes
    conform up under ``schema_evolution=True`` (missing z NULL-fills —
    the round-10 gating makes the UNGATED narrow-after-evolution write
    raise instead of silently NULLing, pinned in
    TestStoreAssignByName); restore can rewind PAST the
    nested evolution (the struct schema reverts) and the sequence
    re-evolves. The model tracks (x, y, z) with z=None wherever no
    evolved write supplied it — which must equal both a carried file's
    NULL-fill and a pre-evolution snapshot's absent field."""
    rng = random.Random(seed)
    model = {k: (k * 10, f"y{k}", None) for k in range(0, KEYSPACE, 2)}
    t = ParquetMergeTable(spark, str(tmp_path / f"ntbl{seed}"))
    t.create(
        spark.createDataFrame(
            [(k, (x, y)) for k, (x, y, _z) in sorted(model.items())],
            "id bigint, s struct<x:int,y:string>",
        ).repartitionByRange(4, F.col("id"))
    )
    history = [dict(model)]

    def snap(version=None):
        df = t.read(version=version)
        has_z = "z" in {
            f.name for f in df.schema["s"].dataType.fields
        }
        return {
            r["id"]: (
                r["s"]["x"],
                r["s"]["y"],
                r["s"]["z"] if has_z else None,
            )
            for r in df.collect()
        }

    def do_merge_narrow():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        delta = {k: (rng.randint(-99, 99), f"m{k}_{len(history)}") for k in ks}
        t.merge(
            spark.createDataFrame(
                [(k, (x, y)) for k, (x, y) in sorted(delta.items())],
                "id bigint, s struct<x:int,y:string>",
            ),
            on=["id"],
            when_matched_update={"s": src("s")},
            # post-evolution the source omits z: NULL-fill is the
            # autoMerge opt-in (ungated it raises — round-10 gating)
            schema_evolution=True,
        )
        # narrow writes conform up: z NULL-fills on updated rows too
        model.update({k: (x, y, None) for k, (x, y) in delta.items()})

    def do_merge_evolved():
        ks = rng.sample(range(KEYSPACE), rng.randint(1, 6))
        delta = {
            k: (2**35 + k, f"e{k}_{len(history)}", rng.randint(1, 9))
            for k in ks
        }
        t.merge(
            spark.createDataFrame(
                [(k, v) for k, v in sorted(delta.items())],
                "id bigint, s struct<x:bigint,y:string,z:bigint>",
            ),
            on=["id"],
            when_matched_update={"s": src("s")},
            schema_evolution=True,
        )
        model.update(delta)

    def do_append_evolved():
        base = KEYSPACE + len(history) * 100
        rows = {
            base + i: (base + i, f"a{base + i}", 7)
            for i in range(rng.randint(1, 3))
        }
        t.append(
            spark.createDataFrame(
                [(k, v) for k, v in sorted(rows.items())],
                "id bigint, s struct<x:bigint,y:string,z:bigint>",
            ),
            schema_evolution=True,
        )
        model.update(rows)

    def do_delete():
        mod, rem = rng.randint(3, 9), rng.randint(0, 2)
        t.delete_where(F.col("id") % mod == rem)
        for k in [k for k in model if k % mod == rem]:
            del model[k]

    def do_compact():
        t.compact(target_files=rng.randint(1, 4))

    def do_restore():
        if len(history) < 2:
            return do_merge_narrow()
        v = rng.randrange(len(history) - 1)
        t.restore(v)
        model.clear()
        model.update(history[v])

    ops = [do_merge_narrow, do_merge_evolved, do_append_evolved, do_delete,
           do_compact, do_restore]
    weights = [3, 3, 2, 2, 1, 1]
    for _ in range(12):
        rng.choices(ops, weights=weights, k=1)[0]()
        history.append(dict(model))
        assert t.current_version() == len(history) - 1, "op/version slip"
        assert snap() == model, f"live state diverged at v{len(history) - 1}"

    # time travel must match the model at EVERY version, including
    # pre-evolution snapshots read under the field-less struct schema
    for v, s in enumerate(history):
        assert snap(version=v) == s, f"time travel diverged at v{v}"
