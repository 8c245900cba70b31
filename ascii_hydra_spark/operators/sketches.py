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


def _cms_bucket(col: "F.Column", r: int, width: int, hash_fn: str) -> "F.Column":
    """Row-r bucket address. hash_fn='xxhash64' is the fast JVM path;
    'md5' is the PORTABLE path (same '#'-seeded scheme as `_md5_bit_pos`)
    whose addresses an external engine can reproduce exactly — the knob
    that lets a count-min entry verify against a SQL oracle bit-for-bit
    instead of registering rows-only."""
    if hash_fn == "md5":
        h = F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit("#"), F.lit(str(r)))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        return F.pmod(h, F.lit(width))
    if hash_fn != "xxhash64":
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    return F.pmod(F.xxhash64(col, F.lit(r)), F.lit(width))


def cms_build(
    items: DataFrame,
    item_col: str,
    *,
    width: int = 1024,
    depth: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(row, bucket, c): count-min cell table over `item_col` occurrences.
    One groupBy per build; output is depth*width cells max."""
    cells = None
    for r in range(depth):
        b = _cms_bucket(F.col(item_col), r, width, hash_fn)
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
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(item, est_n): count-min point estimates for each query item —
    min over the d rows of the addressed cells. The sketch is
    (d*w)-bounded, so it broadcasts; absent cells read as 0."""
    probes = queries.select(F.col(item_col).alias("item")).distinct()
    addressed = None
    for r in range(depth):
        b = _cms_bucket(F.col("item"), r, width, hash_fn)
        part = probes.select("item", F.lit(r).alias("row"), b.alias("bucket"))
        addressed = part if addressed is None else addressed.unionAll(part)
    joined = addressed.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "item", F.coalesce(F.col("c"), F.lit(0)).alias("c")
    )
    return joined.groupBy("item").agg(F.min("c").cast("bigint").alias("est_n"))


def _md5_bit_pos(key: "F.Column", seed: "F.Column", m_bits: int) -> "F.Column":
    """Deterministic bit position: top 60 bits of md5(key || '#' || seed)
    mod m. md5 (not xxhash64) on purpose — both engines expose it, so the
    Bloom entries verify against the DuckDB oracle bit-for-bit, where the
    count-min arm has to register rows-only."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit("#"), seed.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return F.pmod(h, F.lit(m_bits))


def bloom_build(
    keys: DataFrame, key_col: str, *, m_bits: int = 4096, k: int = 4
) -> DataFrame:
    """One-column (pos) set-bit table: the Bloom filter over `key_col`.

    The sparse set-bit form (<= min(k*|keys|, m) rows) rather than a packed
    bitmap: it unions/distincts with ordinary DataFrame ops, merges across
    shards exactly like the count-min cell table (union + distinct is the
    Bloom OR), and broadcasts whole for probing — at the default sizing the
    table is bounded by m rows regardless of corpus size, which is the
    whole point: membership of a 100 TB key set probed without shuffling
    the probe side.
    """
    bits = None
    for s in range(k):
        part = keys.select(
            _md5_bit_pos(F.col(key_col), F.lit(s), m_bits).alias("pos")
        )
        bits = part if bits is None else bits.unionAll(part)
    return bits.distinct()


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bloom OR of two same-sized filters: union + distinct — associative
    and commutative, so per-day/per-shard filters roll up like sketches."""
    return a.unionAll(b).distinct()


def bloom_probe(
    probes: DataFrame,
    key_col: str,
    bits: DataFrame,
    *,
    m_bits: int = 4096,
    k: int = 4,
) -> DataFrame:
    """(key_col, bloom_hit): a probe key hits iff ALL k positions are set.

    The filter broadcasts (<= m rows); the probe side expands k-fold
    map-side (explode of a literal seed range, no driver loop) and reduces
    per key — no shuffle of the probe fact table against the member set,
    which is what the Bloom filter buys over an exact semi-join at scale.
    One-sided error: false positives only, never false negatives.
    """
    pk = probes.select(F.col(key_col).alias("__key")).distinct()
    expanded = pk.select(
        "__key",
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__s"),
    ).select(
        "__key", _md5_bit_pos(F.col("__key"), F.col("__s"), m_bits).alias("pos")
    )
    marked = expanded.join(
        F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left"
    )
    per = marked.groupBy("__key").agg(
        F.sum(F.coalesce(F.col("__set"), F.lit(0))).alias("__n_set")
    )
    return per.select(
        F.col("__key").alias(key_col),
        (F.col("__n_set") == F.lit(k)).alias("bloom_hit"),
    )
