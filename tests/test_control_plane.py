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
