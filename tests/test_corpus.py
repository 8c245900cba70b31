"""Corpus-curation operator properties (operators/corpus.py).

The oracle suite hash-matches the registry queries; these tests pin the
semantic properties that matter at scale: split stability under appends,
contamination exactness on crafted overlaps, and budget monotonicity.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ascii_hydra_spark.operators import corpus


def test_split_stable_under_append(spark):
    """A document's split must not change when the corpus grows — the
    anti-leakage property RNG-based splitting cannot give."""
    small = spark.range(0, 100).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    s_small = {r.doc_id: r.split for r in corpus.train_val_test_split(small, "doc_id").collect()}
    s_big = {r.doc_id: r.split for r in corpus.train_val_test_split(big, "doc_id").collect()}
    assert all(s_big[k] == v for k, v in s_small.items())
    # rough proportions at n=1000 (hash-uniformity sanity, wide tolerance)
    from collections import Counter

    c = Counter(s_big.values())
    assert c["train"] > 800 and 20 <= c["val"] <= 90 and 20 <= c["test"] <= 90


def test_contamination_exact_on_crafted_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares a 3-gram with eval 10
            (2, "zeta eta theta iota kappa"),       # no overlap
        ],
        "doc_id LONG, text STRING",
    )
    ev = spark.createDataFrame(
        [(10, "x alpha beta gamma y")], "doc_id LONG, text STRING"
    )
    out = corpus.contamination_pairs(docs, ev, n=3).collect()
    assert len(out) == 1
    assert (out[0].train_id, out[0].eval_id, out[0].shared_ngrams) == (1, 10, 1)


def test_token_budget_monotone_and_within_budget(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ntoks = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    for budget in (500, 2000):
        kept = corpus.token_budget_mix(d, budget)
        per_src = {
            r.source: r.tok
            for r in kept.groupBy("source").agg(F.sum(ntoks).alias("tok")).collect()
        }
        assert all(v <= budget for v in per_src.values()), per_src
    small = corpus.token_budget_mix(d, 500).count()
    large = corpus.token_budget_mix(d, 2000).count()
    assert small <= large


def test_repetition_stats_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # fully repetitive
            (2, "a b c d"),          # fully distinct
            (3, "a b a b a"),        # alternating: bigrams 'a b','b a','a b','b a'
            (4, "solo"),             # 1 token, no bigrams
        ],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r for r in corpus.repetition_stats(docs).collect()}
    assert got[1].distinct_ratio == 0.25 and got[1].top_token_frac == 1.0
    assert got[1].dup_bigram_frac == round(1 - 1 / 3, 6)
    assert got[2].distinct_ratio == 1.0 and got[2].dup_bigram_frac == 0.0
    assert got[3].top_token_frac == 0.6 and got[3].dup_bigram_frac == 0.5
    assert got[4].distinct_ratio == 1.0 and got[4].dup_bigram_frac == 0.0


def test_pack_sequences_layout(spark):
    """Offsets are the per-source running token sum in doc_id order; a doc's
    sequence is the chunk containing its first token; sources pack
    independently."""
    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),        # 3 toks, off 0, seq 0
            (2, "d e f g", "s1"),      # 4 toks, off 3, seq 0
            (3, "h i j k l m", "s1"),  # 6 toks, off 7, seq 0 (spans into seq 1)
            (4, "n o", "s1"),          # off 13, seq 1
            (10, "x y z", "s2"),       # other source restarts at 0
        ],
        "doc_id LONG, text STRING, source STRING",
    )
    out = {r.doc_id: r for r in corpus.pack_sequences(docs, 10, by="source").collect()}
    assert [(out[i].start_offset, out[i].seq_id) for i in (1, 2, 3, 4)] == [
        (0, 0), (3, 0), (7, 0), (13, 1)
    ]
    assert (out[10].start_offset, out[10].seq_id) == (0, 0)
    # doc 3 spans the seq boundary (tokens 7..12 cross offset 10)
    spans = (out[3].start_offset + out[3].doc_tokens - 1) // 10 != out[3].seq_id
    assert spans


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "same"), (2, "will change"), (3, "will vanish")],
        "doc_id LONG, text STRING",
    )
    new = spark.createDataFrame(
        [(1, "same"), (2, "changed"), (4, "brand new")],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: r.status for r in corpus.corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "modified", 3: "removed", 4: "added"}


def test_balanced_resample_nested_and_stable(spark):
    docs = spark.range(0, 2000).withColumnRenamed("id", "doc_id").withColumn(
        "lang", F.when(F.col("doc_id") % 2 == 0, "en").otherwise("de")
    )
    low = {r.doc_id for r in corpus.balanced_resample(docs, {"en": 200}).collect()}
    high = {r.doc_id for r in corpus.balanced_resample(docs, {"en": 500}).collect()}
    # nested: raising the en quota only ADDS docs
    assert low <= high
    # de untouched (default 1000 keeps everything)
    n_de = docs.filter(F.col("lang") == "de").count()
    assert len([i for i in low if i % 2 == 1]) == n_de
    # rough proportion for en at 200 permille
    n_en_low = len([i for i in low if i % 2 == 0])
    assert 120 <= n_en_low <= 280


def test_token_drift_bounds(spark):
    same = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id LONG, text STRING",
    )
    zero = corpus.token_distribution_drift(same, same).collect()[0]
    assert zero.js_divergence == 0.0
    assert zero.vocab_old == zero.vocab_new == zero.vocab_shared == 4
    other = spark.createDataFrame(
        [(3, "epsilon zeta eta"), (4, "theta iota kappa")],
        "doc_id LONG, text STRING",
    )
    # low smoothing so the 6-token toy corpora aren't flattened by add-k
    far = corpus.token_distribution_drift(same, other, smoothing=0.01).collect()[0]
    # JS divergence is bounded by 1 bit; disjoint vocab should be near it
    assert 0.9 <= far.js_divergence <= 1.0
    assert far.vocab_shared == 0
    # mild overlap sits strictly between
    mixed = spark.createDataFrame(
        [(5, "alpha beta epsilon zeta")], "doc_id LONG, text STRING"
    )
    mid = corpus.token_distribution_drift(same, mixed, smoothing=0.01).collect()[0]
    assert 0.0 < mid.js_divergence < far.js_divergence


def test_top_merge_pairs_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low lower"), (2, "low lowest")], "doc_id LONG, text STRING"
    )
    # BPE-ish pre-tokens: ['low','lower'] / ['low','lowest'] -> pairs
    rows = corpus.top_merge_pairs(docs, k=3).collect()
    got = {r.pair: r.cnt for r in rows}
    assert got == {"low lower": 1, "low lowest": 1}
    # deterministic order: count desc then pair asc
    assert [r.pair for r in rows] == ["low lower", "low lowest"]


def test_bigram_lm_scores_hand_computed(spark):
    """Tiny corpus scored against a pure-python replica of the same
    add-k bigram model (left as explicit arithmetic, not a second copy of
    the operator's code path)."""
    import math
    from collections import Counter

    texts = {1: "a b a b", 2: "a b", 3: "z q"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id LONG, text STRING"
    )
    out = {r.doc_id: r for r in corpus.bigram_lm_scores(docs, k=0.5).collect()}

    toks = {i: t.split() for i, t in texts.items()}
    bigrams = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    c_uw = Counter(p for ps in bigrams.values() for p in ps)
    c_u = Counter(p[0] for ps in bigrams.values() for p in ps)
    V = len({w for ts in toks.values() for w in ts})
    for i, ps in bigrams.items():
        exp = sum(
            -math.log2((c_uw[p] + 0.5) / (c_u[p[0]] + 0.5 * V)) for p in ps
        ) / len(ps)
        assert out[i].n_bigrams == len(ps)
        assert abs(out[i].avg_neg_log2 - round(exp, 6)) < 1e-9
    # doc with a single token has no bigrams and must be absent
    single = spark.createDataFrame([(9, "only")], "doc_id LONG, text STRING")
    assert corpus.bigram_lm_scores(docs.union(single)).filter(
        F.col("doc_id") == 9
    ).count() == 0


def test_perplexity_gate_monotone(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    loose = {r.doc_id for r in corpus.perplexity_gate(docs, 5.5).select("doc_id").collect()}
    tight = {r.doc_id for r in corpus.perplexity_gate(docs, 4.9).select("doc_id").collect()}
    assert tight <= loose
    assert 0 < len(tight) < docs.count()  # the 4.9 threshold separates


def test_tokenize_to_ids_order_and_oov(spark):
    docs = spark.createDataFrame(
        [(1, "b a b c"), (2, "c c")], "doc_id LONG, text STRING"
    )
    vocab = spark.createDataFrame(
        [("b", 1), ("a", 2)], "token STRING, vocab_id LONG"
    )
    out = {r.doc_id: r for r in corpus.tokenize_to_ids(docs, vocab).collect()}
    assert list(out[1].token_ids) == [1, 2, 1, 0]  # document order, c -> unk 0
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert list(out[2].token_ids) == [0, 0] and out[2].n_oov == 2


def test_deterministic_shuffle_order_and_seed(spark):
    import hashlib

    docs = spark.createDataFrame([(i,) for i in range(50)], "doc_id LONG")
    got = [r.doc_id for r in corpus.deterministic_shuffle(docs, "doc_id", seed=7).collect()]
    exp = sorted(range(50), key=lambda i: hashlib.md5(f"{i}_7".encode()).hexdigest())
    assert got == exp
    # rerun-stable; a different seed gives a different order
    again = [r.doc_id for r in corpus.deterministic_shuffle(docs, "doc_id", seed=7).collect()]
    other = [r.doc_id for r in corpus.deterministic_shuffle(docs, "doc_id", seed=8).collect()]
    assert again == got and other != got and sorted(other) == list(range(50))


def test_negative_pairs_match_hashlib_ring(spark):
    """The engine's sharded successor search must equal the literal
    global md5-ring reference computed in plain Python."""
    import hashlib

    from ascii_hydra_spark.operators import corpus

    n, k, seed = 30, 3, 5
    df = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = sorted(
        (r["doc_id"], r["draw"], r["neg_id"])
        for r in corpus.negative_pairs(df, k=k, seed=seed).collect()
    )
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    pos = sorted((md5(f"{i}_ring_{seed}"), i) for i in range(n))
    exp = []
    for i in range(n):
        for d in range(k):
            q = md5(f"{i}_probe_{d}_{seed}")
            succ = next((doc for kk, doc in pos if kk >= q), pos[0][1])
            if succ != i:
                exp.append((i, d, succ))
    assert got == sorted(exp)


def test_negative_pairs_deterministic_and_seed_sensitive(spark):
    from ascii_hydra_spark.operators import corpus

    df = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    a = sorted(map(tuple, corpus.negative_pairs(df, k=2, seed=1).collect()))
    b = sorted(map(tuple, corpus.negative_pairs(df, k=2, seed=1).collect()))
    c = sorted(map(tuple, corpus.negative_pairs(df, k=2, seed=2).collect()))
    assert a == b
    assert a != c
    assert all(doc != neg for doc, _, neg in a)  # no self-pairs survive


def test_temperature_mixing_weights_closed_form(spark):
    from ascii_hydra_spark.operators import corpus

    # two sources with 80/20 doc mass, alpha=0.5:
    # p_temp(A) = sqrt(.8) / (sqrt(.8)+sqrt(.2))
    rows = [("A",)] * 80 + [("B",)] * 20
    df = spark.createDataFrame(rows, "source string")
    out = {r["source"]: r for r in
           corpus.temperature_mixing_weights(df, "source", alpha=0.5).collect()}
    import math

    sa, sb = math.sqrt(0.8), math.sqrt(0.2)
    assert out["A"]["p_raw"] == pytest.approx(0.8, abs=1e-6)
    assert out["A"]["p_temp"] == pytest.approx(sa / (sa + sb), abs=1e-6)
    assert out["B"]["p_temp"] == pytest.approx(sb / (sa + sb), abs=1e-6)
    # temperature flattens: minority upsampled, majority downsampled
    assert out["B"]["upsample"] > 1.0 > out["A"]["upsample"]
    # alpha=1 keeps natural proportions
    nat = {r["source"]: r for r in
           corpus.temperature_mixing_weights(df, "source", alpha=1.0).collect()}
    assert nat["A"]["p_temp"] == pytest.approx(0.8, abs=1e-6)
    assert nat["A"]["upsample"] == pytest.approx(1.0, abs=1e-6)


def test_dsir_importance_identity_target_scores_zero(spark):
    # target == raw corpus: p_t == p_r in every bucket, ln(1) = 0 exactly,
    # floor-quantized term 0 -> every doc scores exactly 0.0
    docs = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee"), (3, "aa aa ff")],
        "doc_id long, text string",
    )
    out = corpus.dsir_importance(docs, docs).collect()
    assert len(out) == 3
    assert all(r["dsir_score"] == 0.0 for r in out)
    assert {r["id"]: r["n_tokens"] for r in out} == {1: 3, 2: 2, 3: 3}


def test_dsir_importance_ranks_target_like_docs_higher(spark):
    # disjoint vocabularies: docs made of target-side words must outscore
    # docs made of words the target never uses
    docs = spark.createDataFrame(
        [(i, "tgtword1 tgtword2 tgtword3") for i in range(5)]
        + [(i + 10, "rawonly1 rawonly2 rawonly3") for i in range(5)],
        "doc_id long, text string",
    )
    target = docs.filter("doc_id < 5")
    out = {r["id"]: r["dsir_score"] for r in corpus.dsir_importance(docs, target).collect()}
    assert min(out[i] for i in range(5)) > max(out[i + 10] for i in range(5))


def test_dsir_importance_external_target_tokens_all_count(spark):
    # round-7 advisor finding: target tokens hashing to buckets ABSENT
    # from the raw corpus must still count toward n_target (the old LEFT
    # join silently dropped them). With an external single-token target
    # disjoint from docs, the exact score of a one-token doc has the
    # closed form floor(1e6 * ln(p_t/p_r)) / 1e6 with n_t = 1, not 0.
    import hashlib
    import math

    doc_tok, tgt_tok = "docwordx", "tgtwordy"
    B = 1024

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % B

    assert bucket(doc_tok) != bucket(tgt_tok), "pick non-colliding tokens"
    docs = spark.createDataFrame([(1, doc_tok)], "doc_id long, text string")
    target = spark.createDataFrame([(9, tgt_tok)], "doc_id long, text string")
    row = corpus.dsir_importance(docs, target).collect()[0]
    # doc bucket: c_t=0, c_r=1; totals n_t=1 (the external token), n_r=1
    p_t = (0 + 0.5) / (1 + 0.5 * B)
    p_r = (1 + 0.5) / (1 + 0.5 * B)
    want = math.floor(1e6 * math.log(p_t / p_r)) / 1e6
    assert row["dsir_score"] == round(want, 6), (row["dsir_score"], want)
