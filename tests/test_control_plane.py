"""Control-plane services (SURVEY §2.7): retry-with-backoff and
pushgateway-style metrics lifecycle."""

import json

import pytest

from hbase_to_mongo_export_spark.plans.metrics import (
    LocalPushGateway,
    MetricsRegistry,
    PeriodicPusher,
)
from hbase_to_mongo_export_spark.plans.retry import RetriesExhausted, retryable


class TestRetryable:
    def test_succeeds_after_transient_failures(self):
        sleeps = []
        calls = {"n": 0}

        @retryable(max_attempts=5, initial_delay_ms=1000, sleep=sleeps.append)
        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise ConnectionError("transient")
            return "ok"

        assert flaky() == "ok"
        assert calls["n"] == 3
        # backoff schedule: 1s then 2s (reference: 1000ms x2)
        assert sleeps == [1.0, 2.0]

    def test_gives_up_after_max_attempts(self):
        sleeps = []

        @retryable(max_attempts=5, initial_delay_ms=1000, sleep=sleeps.append)
        def always_down():
            raise TimeoutError("down")

        with pytest.raises(RetriesExhausted) as ei:
            always_down()
        assert ei.value.attempts == 5
        assert sleeps == [1.0, 2.0, 4.0, 8.0]  # 4 sleeps between 5 attempts

    def test_non_retryable_exception_propagates(self):
        @retryable(retry_on=(ConnectionError,), sleep=lambda s: None)
        def bad_input():
            raise ValueError("not transient")

        with pytest.raises(ValueError):
            bad_input()


class TestMetricsLifecycle:
    def test_periodic_final_and_delete_pushes(self, tmp_path):
        path = str(tmp_path / "metrics.jsonl")
        reg = MetricsRegistry(job="export", instance="test")
        gw = LocalPushGateway(path)
        with PeriodicPusher(reg, gw, interval_s=0.05):
            reg.inc("records_processed", 100)
            reg.inc("records_failed", 2)
            import time

            time.sleep(0.2)  # let a few periodic pushes happen
            reg.set("files_written", 3)
        lines = [json.loads(l) for l in open(path)]
        # at least one periodic push + the final push + the delete marker
        assert len(lines) >= 3
        final = [l for l in lines if l.get("final")]
        assert final and final[-1]["metrics"] == {
            "records_processed": 100.0,
            "records_failed": 2.0,
            "files_written": 3.0,
        }
        assert lines[-1].get("deleted") is True


class TestExportMetricsIntegration:
    def test_run_export_populates_registry(self, spark, tmp_path):
        from hbase_to_mongo_export_spark.plans.export import (
            ExportConfig, run_export,
        )
        from hbase_to_mongo_export_spark.sources import fixtures

        src = fixtures.source_records(spark, n=30)
        reg = MetricsRegistry(job="export")
        res = run_export(
            spark, src,
            ExportConfig(topic="db.database.collection",
                         output_dir=str(tmp_path / "out")),
            metrics=reg,
        )
        assert res.status == "Exported"
        snap = reg.snapshot()
        assert snap["records_processed"] == 30
        assert snap["records_failed"] == 0
        assert snap["files_written"] == len(res.files) >= 1


class TestTableUnavailable:
    """Missing source table folds to Table_Unavailable, never a skip or a
    generic failure (JobCompletionNotificationListener.kt:69-91)."""

    def test_missing_table_sets_status_and_fold(self, spark, tmp_path):
        from hbase_to_mongo_export_spark.plans.export import ExportConfig, run_export
        from hbase_to_mongo_export_spark.plans.status import (
            LocalStatusStore,
            completion_status,
        )
        from hbase_to_mongo_export_spark.sources.catalog import read_export_source

        store = LocalStatusStore(str(tmp_path / "status.jsonl"))
        cfg = ExportConfig(
            topic="does.not.exist", output_dir=str(tmp_path / "out")
        )
        result = run_export(
            spark,
            lambda: read_export_source(spark, str(tmp_path / "no_such_table")),
            cfg,
            correlation_id="r1",
            status_store=store,
        )
        assert result.status == "Table_Unavailable"
        rows = completion_status(store.to_df(spark)).collect()
        assert rows[0].run_status == "COMPLETED_UNSUCCESSFULLY"

    def test_cli_missing_table(self, tmp_path, capsys):
        from hbase_to_mongo_export_spark.__main__ import main

        rc = main([
            "export", "--topic", "does.not.exist",
            "--source", str(tmp_path / "nope"),
            "--output", str(tmp_path / "out"),
            "--status-file", str(tmp_path / "status.jsonl"),
        ])
        assert rc == 1
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["status"] == "Table_Unavailable"


class TestPdmCommonModel:
    def test_pdm_message_on_completed_incremental(self, spark, tmp_path):
        from hbase_to_mongo_export_spark.plans.status import (
            LocalNotifier,
            LocalStatusStore,
            finish_run,
        )

        store = LocalStatusStore(str(tmp_path / "s.jsonl"))
        store.set_status("r1", "c1", "Exported", 2)
        notifier = LocalNotifier(str(tmp_path / "m.jsonl"))
        finish_run(
            spark, "r1", store, notifier,
            snapshot_type="incremental",
            pdm_common_model_site_prefix="common-model/site",
        )
        kinds = [json.loads(l)["kind"]
                 for l in open(tmp_path / "m.jsonl", encoding="utf-8")]
        assert "pdm_common_model" in kinds

    def test_no_pdm_message_for_full_snapshot(self, spark, tmp_path):
        from hbase_to_mongo_export_spark.plans.status import (
            LocalNotifier,
            LocalStatusStore,
            finish_run,
        )

        store = LocalStatusStore(str(tmp_path / "s.jsonl"))
        store.set_status("r1", "c1", "Exported", 2)
        notifier = LocalNotifier(str(tmp_path / "m.jsonl"))
        finish_run(
            spark, "r1", store, notifier,
            snapshot_type="full",
            pdm_common_model_site_prefix="common-model/site",
        )
        kinds = [json.loads(l)["kind"]
                 for l in open(tmp_path / "m.jsonl", encoding="utf-8")]
        assert "pdm_common_model" not in kinds
