"""Mergeable frequency sketches: count-min (Cormode & Muthukrishnan 2005).

Companion to the HLL distinct-count path (`hll_sketch_agg` in
verification.py's C20 arm): HLL answers "how many distinct", count-min
answers "roughly how often does X occur" in O(d*w) space regardless of
corpus size. The sketch here is a plain DataFrame of (row, bucket, c)
cells, so it composes with everything else in the engine:

* BUILD is one corpus-sized explode + a (d*w)-bounded groupBy — the cell
  table is the sketch; persisting it IS checkpointing the sketch.
* MERGE of two sketches (days, shards, snapshots) is union + groupBy-sum
  — associative and commutative, the property that makes the sketch
  usable across executors and ingestion days at 100 TB.
* QUERY broadcasts the (d*w)-row cell table against the query terms and
  takes min over the d rows — the classic over-estimate-only bound:
  true <= est <= true + eps*N with prob 1-delta for w = ceil(e/eps),
  d = ceil(ln(1/delta)).

Hashing is xxhash64 with literal per-row seeds — deterministic across
runs/partitionings (no RNG), which is why the sketch is reproducible and
testable. xxhash64 has no DuckDB twin, so the registry entry registers
rows-only; the over-estimate and accuracy bounds are asserted in
tests/test_analytics.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def cms_build(
    items: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(row, bucket, c): count-min cell table over `item_col` occurrences.
    One groupBy per build; output is depth*width cells max."""
    cells = None
    for r in range(depth):
        b = F.pmod(F.xxhash64(F.col(item_col), F.lit(r)), F.lit(width))
        part = items.select(F.lit(r).alias("row"), b.alias("bucket"))
        cells = part if cells is None else cells.unionAll(part)
    return cells.groupBy("row", "bucket").agg(F.count("*").alias("c"))


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two cell tables (same width/depth): union + sum — the
    associative combine that lets per-day/per-shard sketches roll up."""
    return (
        a.unionAll(b)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """(item, est_n): count-min point estimates for each query item —
    min over the d rows of the addressed cells. The sketch is
    (d*w)-bounded, so it broadcasts; absent cells read as 0."""
    probes = queries.select(F.col(item_col).alias("item")).distinct()
    addressed = None
    for r in range(depth):
        b = F.pmod(F.xxhash64(F.col("item"), F.lit(r)), F.lit(width))
        part = probes.select("item", F.lit(r).alias("row"), b.alias("bucket"))
        addressed = part if addressed is None else addressed.unionAll(part)
    joined = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "item", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy("item").agg(F.min("c").cast("bigint").alias("est_n"))
