"""Control-plane: run-status store, completion aggregation, notifications.

The reference tracks per-(correlation id, collection) export status in
DynamoDB, folds them into a run-level completion status, and emits SQS/SNS
messages (SURVEY §2.6-2.7: A2, A3, control-plane list). Here the same
capability is a pluggable store with a local JSONL backend; the completion
fold is a real Spark aggregation so it works at any number of collections.

Status vocabulary (DynamoDBExportStatusService.kt:162-165):
    Exporting, Exported, Sent, Received, Success,
    Export_Failed, Table_Unavailable, Blocked_Topic
Completion fold (DynamoDBExportStatusService.kt:30-46):
    all ∈ {Exported, Sent, Received, Success} → COMPLETED_SUCCESSFULLY
    any == Exporting                          → IN_PROGRESS
    any ∈ {Export_Failed, Blocked_Topic, Table_Unavailable}
                                              → COMPLETED_UNSUCCESSFULLY
    otherwise                                 → NOT_COMPLETED
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SUCCESS_STATUSES = ("Exported", "Sent", "Received", "Success")
FAILURE_STATUSES = ("Export_Failed", "Blocked_Topic", "Table_Unavailable")


@dataclass
class LocalStatusStore:
    """File-backed stand-in for the DynamoDB status table. One JSON line per
    upsert; latest line per (correlation_id, collection) wins."""

    path: str
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    def set_status(
        self,
        correlation_id: str,
        collection: str,
        status: str,
        files_exported: int = 0,
    ) -> None:
        rec = {
            "correlation_id": correlation_id,
            "collection": collection,
            "status": status,
            "files_exported": files_exported,
        }
        with self._lock:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(rec) + "\n")

    def increment_exported_count(self, correlation_id: str, collection: str) -> None:
        """A2: per-file counter bump (atomic ADD in the reference,
        DynamoDBExportStatusService.kt:53-58)."""
        with self._lock:
            counts = self._counts()
            counts[(correlation_id, collection)] = (
                counts.get((correlation_id, collection), 0) + 1
            )
        self.set_status(
            correlation_id,
            collection,
            "Exporting",
            counts[(correlation_id, collection)],
        )

    def _counts(self) -> dict:
        out: dict = {}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as fh:
                for line in fh:
                    r = json.loads(line)
                    out[(r["correlation_id"], r["collection"])] = r.get(
                        "files_exported", 0
                    )
        return out

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Latest status per (correlation_id, collection) as a DataFrame."""
        rows = []
        seen: dict = {}
        if os.path.exists(self.path):
            with open(self.path, encoding="utf-8") as fh:
                for line in fh:
                    r = json.loads(line)
                    seen[(r["correlation_id"], r["collection"])] = r
        rows = list(seen.values())
        schema = "correlation_id string, collection string, status string, files_exported int"
        return spark.createDataFrame(rows, schema=schema) if rows else spark.createDataFrame([], schema)


def completion_status(status_df: DataFrame) -> DataFrame:
    """A3 as a Spark aggregation: one row per correlation_id with the folded
    run status — scales to any collection count, no driver-side loop."""
    is_success = F.col("status").isin(*SUCCESS_STATUSES)
    is_failure = F.col("status").isin(*FAILURE_STATUSES)
    agg = status_df.groupBy("correlation_id").agg(
        F.min(is_success.cast("int")).alias("_all_success"),
        F.max((F.col("status") == "Exporting").cast("int")).alias("_any_in_progress"),
        F.max(is_failure.cast("int")).alias("_any_failed"),
        F.sum("files_exported").alias("files_exported"),
        F.count(F.lit(1)).alias("collections"),
    )
    return agg.select(
        "correlation_id",
        "collections",
        "files_exported",
        F.when(F.col("_all_success") == 1, F.lit("COMPLETED_SUCCESSFULLY"))
        .when(F.col("_any_in_progress") == 1, F.lit("IN_PROGRESS"))
        .when(F.col("_any_failed") == 1, F.lit("COMPLETED_UNSUCCESSFULLY"))
        .otherwise(F.lit("NOT_COMPLETED"))
        .alias("run_status"),
    )


@dataclass
class LocalNotifier:
    """JSONL stand-in for the SQS/SNS control messages (SURVEY §2.7)."""

    path: str

    def _emit(self, kind: str, payload: dict) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(json.dumps({"kind": kind, **payload}) + "\n")

    def notify_snapshot_sender(self, topic: str, object_key: str) -> None:
        self._emit(
            "snapshot_file",
            {"message_group": topic.replace(".", "_"), "object_key": object_key},
        )

    def notify_no_files_exported(self, topic: str) -> None:
        self._emit("no_files_exported", {"topic": topic})

    def notify_completion(self, correlation_id: str, run_status: str) -> None:
        self._emit(
            "completion", {"correlation_id": correlation_id, "run_status": run_status}
        )

    def notify_adg_trigger(self, correlation_id: str, s3_prefix: str,
                           snapshot_type: str, export_date: str) -> None:
        """ADG-trigger payload on successful completion
        (SnsServiceImpl.kt:22-37 in the reference)."""
        self._emit(
            "adg_trigger",
            {
                "correlation_id": correlation_id,
                "s3_prefix": s3_prefix,
                "snapshot_type": snapshot_type,
                "export_date": export_date,
            },
        )

    def notify_monitoring(self, correlation_id: str, status: str,
                          severity: str = "Critical") -> None:
        """Completion/failure monitoring payload (SnsServiceImpl.kt:50-115)."""
        self._emit(
            "monitoring",
            {"correlation_id": correlation_id, "status": status,
             "severity": severity},
        )

    def notify_data_egress(self, object_key: str) -> None:
        """S3-event-shaped data-egress message (SQSMessagingService.kt:87-99)."""
        self._emit("data_egress", {"object_key": object_key})

    def notify_pdm_common_model(self, site_prefix: str) -> None:
        """PDM common-model message: the reference sends a data-egress
        message for the PDM site prefix on incremental-run completion
        (JobCompletionNotificationListener.kt:106-112)."""
        self._emit("pdm_common_model", {"site_prefix": site_prefix})


def finish_run(
    spark: SparkSession,
    correlation_id: str,
    store: LocalStatusStore,
    notifier: LocalNotifier | None = None,
    s3_prefix: str = "",
    snapshot_type: str = "full",
    export_date: str = "",
    pdm_common_model_site_prefix: str = "",
) -> str:
    """Reference afterJob tail (JobCompletionNotificationListener.kt:47-67):
    fold per-collection statuses into the run status, emit the completion
    monitoring message, the ADG trigger when fully successful, and the PDM
    common-model message for completed incremental runs
    (JobCompletionNotificationListener.kt:106-112).
    Returns the folded run status."""
    rows = completion_status(store.to_df(spark)).filter(
        F.col("correlation_id") == correlation_id
    ).collect()
    run_status = rows[0].run_status if rows else "NOT_COMPLETED"
    if notifier is not None:
        notifier.notify_completion(correlation_id, run_status)
        notifier.notify_monitoring(
            correlation_id,
            "Export completed successfully"
            if run_status == "COMPLETED_SUCCESSFULLY"
            else f"Export finished: {run_status}",
            severity="Critical" if run_status != "COMPLETED_SUCCESSFULLY" else "Low",
        )
        if run_status == "COMPLETED_SUCCESSFULLY":
            notifier.notify_adg_trigger(
                correlation_id, s3_prefix, snapshot_type, export_date
            )
        if (
            pdm_common_model_site_prefix
            and snapshot_type == "incremental"
            and run_status
            in ("COMPLETED_SUCCESSFULLY", "COMPLETED_UNSUCCESSFULLY")
        ):
            notifier.notify_pdm_common_model(pdm_common_model_site_prefix)
    return run_status
