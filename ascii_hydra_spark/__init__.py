"""ascii_hydra_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference multi-platform Spark pipeline framework
(ascii-supply-networks/ascii-hydra), plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed
for 100 TB scale.

Layers
------
- :mod:`ascii_hydra_spark.session`   — tuned SparkSession builder + runtime conf
  (mirrors the semantic commitments of the reference dev/full Spark profiles,
  reference: ascii_library/orchestration/resources/spark.py:32-71).
- :mod:`ascii_hydra_spark.catalog`   — logical table name -> physical path
  resolution per execution mode (reference: orchestration/pipes/spark_script_abc.py:32-67).
- :mod:`ascii_hydra_spark.sources`   — batch sources/sinks (parquet/csv/json/text,
  hive-partitioned layouts, dynamic partition overwrite).
- :mod:`ascii_hydra_spark.functions` — pure Column-expression helpers (cosine
  similarity, tokenizers, fingerprints) that stay inside Catalyst/codegen.
- :mod:`ascii_hydra_spark.operators` — relational + LLM-data operators
  (dedup, similarity, text analysis, as-of joins, windows, multimodal).
- :mod:`ascii_hydra_spark.streaming` — Structured Streaming recipes whose
  availableNow runs are hash-equivalent to their batch formulations.
- :mod:`ascii_hydra_spark.plans`     — minimal asset/DAG runner with run
  reports (reference: orchestration/pipes/spark_pipes_factory.py:97-166).

Everything is declarative DataFrame/SQL first; Catalyst + AQE own the
physical plan. Python UDFs appear only where built-ins genuinely cannot
express the semantics, and then always Arrow-batched.
"""

from ascii_hydra_spark.session import (
    ExecutionMode,
    SessionProfile,
    build_spark,
    calculate_parallelism,
    configure_runtime,
)
from ascii_hydra_spark.catalog import Catalog, TABLES

__all__ = [
    "ExecutionMode",
    "SessionProfile",
    "build_spark",
    "calculate_parallelism",
    "configure_runtime",
    "Catalog",
    "TABLES",
]

__version__ = "0.1.0"
