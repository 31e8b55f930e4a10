"""Copy-on-write MERGE table (operators/merge.py): row semantics, file
pruning, manifest atomicity, time travel."""

import os

import pytest
from pyspark.sql import functions as F

from hbase_to_mongo_export_spark.operators.merge import (
    MergeError,
    ParquetMergeTable,
    src,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = ParquetMergeTable(spark, str(tmp_path / "tbl"))
    base = spark.createDataFrame(
        [(i, f"name{i}", float(i * 10)) for i in range(100)],
        "id bigint, name string, amount double",
    )
    # cluster by id so key-ranges map to files → pruning has something
    # to prune (10 files of 10 ids each)
    t.create(
        base.repartitionByRange(10, F.col("id")).sortWithinPartitions("id"),
    )
    return t


def _as_dict(df):
    return {r["id"]: (r["name"], r["amount"]) for r in df.collect()}


class TestMergeSemantics:
    def test_update_insert_delete(self, spark, table):
        source = spark.createDataFrame(
            [
                (5, "updated5", 999.0, "update"),
                (7, None, None, "delete"),
                (200, "new200", 1.0, "insert"),
            ],
            "id bigint, name string, amount double, op string",
        )
        stats = table.merge(
            source,
            on=["id"],
            when_matched_update={
                "name": src("name"),
                "amount": src("amount"),
            },
            when_matched_delete=src("op") == "delete",
        )
        got = _as_dict(table.read())
        assert got[5] == ("updated5", 999.0)
        assert 7 not in got
        assert got[200] == ("new200", 1.0)
        assert got[6] == ("name6", 60.0)  # untouched row intact
        assert len(got) == 100  # 100 - 1 deleted + 1 inserted
        assert stats["rows_inserted"] == 1

    def test_update_expression_mixes_target_and_source(self, spark, table):
        source = spark.createDataFrame([(3, 5.0)], "id bigint, bump double")
        table.merge(
            source,
            on=["id"],
            when_matched_update={"amount": F.col("amount") + src("bump")},
            insert_not_matched=False,
        )
        assert _as_dict(table.read())[3] == ("name3", 35.0)

    def test_duplicate_source_keys_rejected(self, spark, table):
        dup = spark.createDataFrame(
            [(1, "a", 0.0), (1, "b", 0.0)], "id bigint, name string, amount double"
        )
        with pytest.raises(MergeError, match="duplicate merge keys"):
            table.merge(dup, on=["id"], when_matched_update={"name": src("name")})

    def test_insert_only_merge(self, spark, table):
        source = spark.createDataFrame(
            [(300, "n", 0.0), (4, "ignored", 0.0)],
            "id bigint, name string, amount double",
        )
        stats = table.merge(source, on=["id"])  # no matched clauses
        got = _as_dict(table.read())
        assert got[4] == ("name4", 40.0)  # matched row untouched
        assert got[300] == ("n", 0.0)
        assert stats["rows_inserted"] == 1


class TestCopyOnWrite:
    def test_untouched_files_carried_by_reference(self, spark, table):
        v0_files = set(table._manifest(0)["files"])
        # ids 0-9 live in one range file; touch only them
        source = spark.createDataFrame(
            [(2, "x", 0.0)], "id bigint, name string, amount double"
        )
        stats = table.merge(
            source,
            on=["id"],
            when_matched_update={"name": src("name")},
            insert_not_matched=False,
        )
        assert stats["files_total"] == 10
        assert stats["files_touched"] == 1
        assert stats["files_carried"] == 9
        v1_files = set(table._manifest(1)["files"])
        # the 9 untouched files are the SAME paths (no rewrite, no IO)
        assert len(v0_files & v1_files) == 9

    def test_no_match_no_rewrite(self, spark, table):
        source = spark.createDataFrame(
            [(999, "n", 0.0)], "id bigint, name string, amount double"
        )
        stats = table.merge(source, on=["id"])
        assert stats["files_touched"] == 0
        assert stats["files_carried"] == 10


class TestVersioning:
    def test_time_travel(self, spark, table):
        source = spark.createDataFrame(
            [(0, "changed", -1.0)], "id bigint, name string, amount double"
        )
        table.merge(
            source,
            on=["id"],
            when_matched_update={"name": src("name"), "amount": src("amount")},
        )
        assert _as_dict(table.read(version=0))[0] == ("name0", 0.0)
        assert _as_dict(table.read())[0] == ("changed", -1.0)

    def test_history_records_operations(self, spark, table):
        source = spark.createDataFrame(
            [(1, "u", 1.0)], "id bigint, name string, amount double"
        )
        table.merge(source, on=["id"], when_matched_update={"name": src("name")})
        hist = table.history()
        assert [h["operation"] for h in hist] == ["create", "merge"]
        assert hist[1]["version"] == 1

    def test_commit_is_atomic_rename(self, spark, table):
        # no .tmp files left behind after commits
        leftovers = [
            f for f in os.listdir(table.manifest_dir) if f.endswith(".tmp")
        ]
        assert leftovers == []


class TestMaintenance:
    def test_compact_then_time_travel(self, spark, table):
        stats = table.compact(sort_col="id", target_files=2)
        assert stats["files_written"] == 2
        assert table._manifest(stats["version"])["operation"] == "compact"
        # same data, fewer files; old version still readable
        assert _as_dict(table.read()) == _as_dict(table.read(version=0))

    def test_vacuum_preserves_shared_files(self, spark, table):
        # merge touching 1 file → v1 shares 9 files with v0
        source = spark.createDataFrame(
            [(2, "x", 0.0)], "id bigint, name string, amount double"
        )
        table.merge(source, on=["id"], when_matched_update={"name": src("name")},
                    insert_not_matched=False)
        res = table.vacuum(retain_last=1)
        # only v0's ONE rewritten-away file is dead; the 9 shared survive
        assert res["files_removed"] == 1
        assert res["versions_dropped"] == 1
        got = _as_dict(table.read())
        assert got[2] == ("x", 20.0)
        assert len(got) == 100
        with pytest.raises(FileNotFoundError):
            table.read(version=0)

    def test_vacuum_retain_all_is_noop(self, spark, table):
        res = table.vacuum(retain_last=5)
        assert res["files_removed"] == 0
        assert _as_dict(table.read())[0] == ("name0", 0.0)


class TestStreamMergeUpsert:
    def test_foreachbatch_upsert(self, spark, tmp_path):
        from hbase_to_mongo_export_spark.operators.merge import (
            stream_merge_upsert,
        )

        t = ParquetMergeTable(spark, str(tmp_path / "tbl"))
        t.create(
            spark.createDataFrame(
                [(i, float(i)) for i in range(10)], "id bigint, val double"
            )
        )
        src_dir = tmp_path / "incoming"
        src_dir.mkdir()
        ckpt = str(tmp_path / "ckpt")
        stream = spark.readStream.schema("id bigint, val double").parquet(
            str(src_dir)
        )
        writer = stream_merge_upsert(t, stream, on=["id"], update_cols=["val"],
                                     checkpoint_dir=ckpt)

        # batch 1: update 5..9, insert 10..14
        spark.createDataFrame(
            [(i, 100.0 + i) for i in range(5, 15)], "id bigint, val double"
        ).coalesce(1).write.mode("append").parquet(str(src_dir))
        writer.trigger(availableNow=True).start().awaitTermination(120)

        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got[4] == 4.0
        assert got[7] == 107.0
        assert got[14] == 114.0
        assert len(got) == 15

        # batch 2 with the SAME checkpoint: only the new file processes
        spark.createDataFrame(
            [(0, -1.0)], "id bigint, val double"
        ).coalesce(1).write.mode("append").parquet(str(src_dir))
        writer.trigger(availableNow=True).start().awaitTermination(120)
        got = {r["id"]: r["val"] for r in t.read().collect()}
        assert got[0] == -1.0 and got[7] == 107.0 and len(got) == 15
        ops = [h["operation"] for h in t.history()]
        assert ops[0] == "create" and ops.count("merge") >= 2
