"""SparkScript — the reference's business-logic script pattern, local-first.

A reference user writes a script subclassing `SparkScriptPipes` and
implements `execute_business_logic(context, execution_mode, partition_key,
spark, engine)` (reference: orchestration/pipes/spark_script_abc.py:69-118;
demo step_1.py:14-57). The cloud transports (Dagster pipes env-var context,
DBFS/S3 message channels) are infra, not query capability (SURVEY §2.4);
this class keeps the authoring contract — same method signature, same
execution-mode semantics, same run-report metadata — on a plain local
runner, so reference business logic ports by changing only the base class.
"""

from __future__ import annotations

import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession

from ascii_hydra_spark.session import ExecutionMode, SessionProfile, build_spark


@dataclass
class ScriptContext:
    """Dagster-pipes-free context: collects the metadata the reference
    reports via `context.report_asset_materialization` (step_2.py:34-43)."""

    reports: list[dict] = field(default_factory=list)

    def report_asset_materialization(self, metadata: dict[str, Any] | None = None) -> None:
        self.reports.append(dict(metadata or {}))


class SparkScript(ABC):
    """Subclass and implement `execute_business_logic`; call `run_local()`.

    The reference's remote flavors (Databricks/EMR) attach to a provisioned
    cluster with `SparkSession.builder.getOrCreate()` — the same
    `execute_business_logic` body runs there unchanged; only session
    construction differs.
    """

    def __init__(
        self,
        execution_mode: ExecutionMode = ExecutionMode.DEV_SAMPLE_LOCAL,
        partition_key: str | None = None,
        profile: SessionProfile | None = None,
    ) -> None:
        self.execution_mode = execution_mode
        self.partition_key = partition_key
        self.profile = profile

    @abstractmethod
    def execute_business_logic(
        self,
        context: ScriptContext,
        execution_mode: ExecutionMode,
        partition_key: str | None,
        spark: SparkSession,
    ) -> Any:
        """The user's query/pipeline body (reference step_1.py:14-53)."""

    def run_local(self, spark: SparkSession | None = None) -> ScriptContext:
        """Local runner: build (or reuse) a session, execute, time it, and
        return the context with collected run reports."""
        ctx = ScriptContext()
        s = spark or build_spark(self.profile or SessionProfile.dev())
        t0 = time.monotonic()
        self.execute_business_logic(ctx, self.execution_mode, self.partition_key, s)
        ctx.reports.append(
            {"__run__": True, "duration_sec": round(time.monotonic() - t0, 3)}
        )
        return ctx
