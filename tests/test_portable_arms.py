"""Pure-Python reference checks for the PORTABLE (oracle-replayable)
sketch/LSH arms added in round 5.

Each portable arm shares one hash scheme — the top-60-bits-of-md5
integer — between the Spark operator and its DuckDB oracle. These tests
pin the Spark side against a literal hashlib re-implementation on small
crafted inputs, so the semantics hold independent of what DuckDB
computes (the oracle differential lives in the registry sweep; THIS is
the third leg of the tripod).
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------- minhash


def _ref_minhash_sig(text: str, num_hashes: int = 16) -> list[int]:
    toks = [t for t in text.split() if t]
    shingles = {f"{a} {b}" for a, b in zip(toks, toks[1:])}
    return [
        min(_h60(f"{s}#{i}") for s in shingles) for i in range(num_hashes)
    ]


def test_portable_minhash_pairs_match_reference(spark):
    from ascii_hydra_spark.operators import dedup

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup
        (3, "completely different text with no overlap at all here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs_portable(
            df, "doc_id", "text", threshold=0.8
        ).collect()
    }
    # identical docs share every band -> candidate -> jaccard 1.0
    assert out == {(1, 2): 1.0}
    # and the signatures themselves equal the hashlib reference
    assert _ref_minhash_sig(rows[0][1]) == _ref_minhash_sig(rows[1][1])


# ---------------------------------------------------------------- simhash


def _ref_simhash(text: str, bits: int = 48) -> int:
    toks = [t for t in text.split() if t]
    sums = [0] * bits
    for t in toks:
        h = _h60(t)
        for b in range(bits):
            sums[b] += 1 if (h >> b) & 1 else -1
    return sum(1 << b for b in range(bits) if sums[b] > 0)


def test_portable_simhash_matches_reference(spark):
    from ascii_hydra_spark.operators import dedup

    texts = [
        "alpha beta gamma delta epsilon",
        "alpha beta gamma delta zeta",
        "one two three four five six",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(
            df, "doc_id", "text", bits=48, hash_fn="md5"
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _ref_simhash(t), f"doc {i}"


# ---------------------------------------------------------------- SRP-LSH


def test_rademacher_planes_are_stable_and_reproducible():
    from ascii_hydra_spark.operators.similarity import rademacher_planes

    p1 = rademacher_planes(8, 4, seed=7)
    p2 = rademacher_planes(8, 4, seed=7)
    assert p1 == p2
    assert all(s in (1.0, -1.0) for row in p1 for s in row)
    # first row pinned against the literal hashlib definition
    expect = [
        1.0
        if int(hashlib.md5(f"7:0:{d}".encode()).hexdigest()[0], 16) & 1
        else -1.0
        for d in range(8)
    ]
    assert p1[0] == expect


def test_srp_lsh_identical_vectors_always_pair(spark):
    from ascii_hydra_spark.operators import similarity

    base = [float(i % 5 - 2) for i in range(8)]
    other = [float((i * 3) % 7 - 3) for i in range(8)]
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, other)],
        "vec_id long, embedding array<double>",
    )
    out = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.cosine_pairs_lsh_portable(
            df, threshold=0.99, n_planes=4, dim=8
        ).collect()
    }
    assert out == {(0, 1): 1.0}  # identical vectors share every sign bit


# ---------------------------------------------------------------- HLL


def _ref_hll_registers(keys, b_bits: int = 9) -> dict[int, int]:
    m = 1 << b_bits
    regs: dict[int, int] = {}
    for k in keys:
        h = _h60(str(k))
        bucket, rem = h % m, h >> b_bits
        if rem == 0:
            rho = 60 - b_bits
        else:
            rho = (rem & -rem).bit_length()  # trailing zeros + 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def test_portable_hll_registers_match_reference(spark):
    from ascii_hydra_spark.operators import sketches

    keys = list(range(200))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["bucket"]: r["max_rho"]
        for r in sketches.hll_portable_cells(df, "k").collect()
    }
    assert got == _ref_hll_registers(keys)


# ---------------------------------------------------------------- CMS


def test_portable_cms_counts_match_reference(spark):
    from ascii_hydra_spark.operators import sketches

    items = ["a", "b", "a", "c", "a", "b"]
    df = spark.createDataFrame([(x,) for x in items], "term string")
    sk = sketches.cms_build(df, "term", width=64, depth=2, hash_fn="md5")
    est = {
        r["item"]: r["est_n"]
        for r in sketches.cms_estimate(
            sk,
            spark.createDataFrame([("a",), ("b",), ("c",)], "term string"),
            "term",
            width=64,
            depth=2,
            hash_fn="md5",
        ).collect()
    }
    true = {"a": 3, "b": 2, "c": 1}
    # over-estimate-only bound, and with 6 items in 64 buckets almost
    # surely exact; verify the address scheme against hashlib directly
    for t, n in true.items():
        assert est[t] >= n
    cells = {(r["row"], r["bucket"]): r["c"] for r in sk.collect()}
    for r_i in range(2):
        ref: dict[int, int] = {}
        for x in items:
            ref[_h60(f"{x}#{r_i}") % 64] = ref.get(_h60(f"{x}#{r_i}") % 64, 0) + 1
        assert {b: c for (ri, b), c in cells.items() if ri == r_i} == ref


# ------------------------------------------------------------- MMR greedy


def test_mmr_duplicate_demoted_under_portable_round(spark):
    from ascii_hydra_spark.operators import retrieval

    v1 = [1.0, 0.0, 0.0, 0.0]
    v2 = [0.0, 1.0, 0.0, 0.0]
    rows = [(1, v1, 0.95), (2, v1, 0.90), (3, v2, 0.50)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, rel double"
    )
    out = retrieval.mmr_rerank(
        df, "vec_id", "embedding", "rel", k=3, lam=0.7
    ).collect()
    order = [r["vec_id"] for r in out]
    # the duplicate of the top pick is demoted below the orthogonal
    # lower-relevance item: 0.7*0.90 - 0.3*1.0 = 0.33 < 0.35 = 0.7*0.5
    assert order == [1, 3, 2]
