"""PII redaction / boilerplate removal / chunking semantics (operators/text.py).

The oracle suite hash-matches the registry aggregates; these tests pin the
row-level semantics on crafted inputs where the expected output is known
by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ascii_hydra_spark.operators import text


def test_redact_pii_crafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.org now"),
            (2, "server at 192.168.0.17 rebooted"),
            (3, "call +1 555 867-5309 or +44-20-7946-0958 today"),
            (4, "nothing sensitive here"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in text.redact_pii(docs).collect()}
    assert out[1].n_email == 1 and out[1].text_redacted == "contact <EMAIL> now"
    assert out[2].n_ipv4 == 1 and out[2].text_redacted == "server at <IPV4> rebooted"
    assert out[3].n_phone == 1  # the second number uses '-' after country code
    assert "<PHONE>" in out[3].text_redacted
    assert out[4].n_email == out[4].n_ipv4 == out[4].n_phone == 0
    assert out[4].text_redacted == "nothing sensitive here"


def test_remove_boilerplate_crafted(spark):
    # 4-token boilerplate prefix shared by 3 docs; unique tails survive.
    bp = "accept all cookies now"
    docs = spark.createDataFrame(
        [
            (1, f"{bp} alpha beta gamma delta"),
            (2, f"{bp} epsilon zeta eta theta"),
            (3, f"{bp} iota kappa lam mu"),
            (4, "totally unique document body here"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in text.remove_boilerplate(docs, min_docs=3).collect()}
    assert out[1].text_clean == "alpha beta gamma delta"
    assert out[2].text_clean == "epsilon zeta eta theta"
    assert out[3].text_clean == "iota kappa lam mu"
    assert out[4].text_clean == "totally unique document body here"
    # doc 1: boilerplate window dropped, one 4-token tail window kept;
    # doc 4: 5 tokens -> two windows (4+1), both kept
    assert out[1].n_segments_kept == 1 and out[4].n_segments_kept == 2


def test_remove_boilerplate_fully_boilerplate_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(i, "same four token text") for i in range(1, 5)],
        "doc_id LONG, text STRING",
    )
    out = text.remove_boilerplate(docs, min_docs=3).collect()
    assert len(out) == 4
    assert all(r.text_clean == "" and r.n_segments_kept == 0 for r in out)


def test_chunk_documents_exact_layout(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id LONG, text STRING"
    )
    rows = sorted(
        text.chunk_documents(docs, chunk_size=4, stride=3).collect(),
        key=lambda r: r.start,
    )
    assert [r.start for r in rows] == [0, 3, 6, 9]
    assert [r.chunk_tokens for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # overlap of 1 token
    assert rows[3].chunk_text == "t9"


def test_chunk_documents_no_overlap_reconstructs(spark):
    docs = spark.createDataFrame(
        [(7, "a b c d e f g")], "doc_id LONG, text STRING"
    )
    rows = sorted(
        text.chunk_documents(docs, chunk_size=3, stride=3).collect(),
        key=lambda r: r.start,
    )
    assert " ".join(r.chunk_text for r in rows) == "a b c d e f g"
    empty = spark.createDataFrame([(8, "")], "doc_id LONG, text STRING")
    assert text.chunk_documents(empty, 3, 3).count() == 0


def test_line_segments_split(spark):
    docs = spark.createDataFrame(
        [(1, "header line\nbody text here\n\nfooter line")],
        "doc_id LONG, text STRING",
    )
    segs = docs.select(text.line_segments("text").alias("s")).collect()[0].s
    assert segs == ["header line", "body text here", "footer line"]


def test_build_vocab_rank_and_min_df(spark):
    docs = spark.createDataFrame(
        [(1, "b a a"), (2, "a b c"), (3, "a d")],
        "doc_id LONG, text STRING",
    )
    rows = {r.token: r for r in text.build_vocab(docs).collect()}
    # a: count 4 df 3; b: count 2 df 2; c: 1/1; d: 1/1 (c before d on tie)
    # NB: r["count"] not r.count — Row.count is the tuple method
    assert (rows["a"].vocab_id, rows["a"]["count"], rows["a"].df) == (1, 4, 3)
    assert rows["b"].vocab_id == 2
    assert (rows["c"].vocab_id, rows["d"].vocab_id) == (3, 4)
    top2 = text.build_vocab(docs, max_vocab=2).collect()
    assert sorted(r.token for r in top2) == ["a", "b"]
    df2 = text.build_vocab(docs, min_df=2).collect()
    assert sorted(r.token for r in df2) == ["a", "b"]


def test_top_terms_per_group_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "x y y z", "en"), (2, "x z", "en"), (3, "q q r", "de")],
        "doc_id LONG, text STRING, lang STRING",
    )
    rows = text.top_terms_per_group(docs, by="lang", k=2).collect()
    en = sorted([(r.rk, r.token, r.cnt) for r in rows if r.lang == "en"])
    de = sorted([(r.rk, r.token, r.cnt) for r in rows if r.lang == "de"])
    # en: x=2, y=2, z=2 -> tie broken lexicographically: x then y
    assert en == [(1, "x", 2), (2, "y", 2)]
    assert de == [(1, "q", 2), (2, "r", 1)]


def test_substring_dedup_canonical_survives(spark):
    """Lee-et-al semantics for fixed W: exactly one canonical copy of a
    duplicated passage survives corpus-wide; internal repetition within a
    later doc is removed entirely; untouched docs pass through."""
    from ascii_hydra_spark.operators.text import (
        duplicate_window_spans,
        remove_duplicate_substrings,
    )

    shared = "one two three four five six seven"
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"x y {shared} z w"),
            (3, "totally unrelated text with enough words here"),
            (4, f"{shared} {shared} tail"),
        ],
        "doc_id long, text string",
    )
    spans = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_window_spans(docs, window=5).collect()
    }
    assert spans == {(2, 2, 9), (4, 0, 14)}  # doc 1 is canonical, untouched
    out = {r.doc_id: r for r in remove_duplicate_substrings(docs, window=5).collect()}
    assert out[1].text_clean == f"alpha beta {shared} gamma delta"
    assert out[2].text_clean == "x y z w" and out[2].n_tokens_removed == 7
    assert out[3].n_tokens_removed == 0
    assert out[4].text_clean == "tail" and out[4].n_tokens_removed == 14


def test_substring_dedup_short_docs_no_windows(spark):
    """Docs shorter than W emit no windows and can never be clipped."""
    from ascii_hydra_spark.operators.text import remove_duplicate_substrings

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in remove_duplicate_substrings(docs, window=5).collect()}
    assert out[1].n_tokens_removed == 0 and out[2].n_tokens_removed == 0


def test_lexical_diversity_closed_form(spark):
    docs = spark.createDataFrame(
        [
            # S1: 6 tokens, 3 types (a x3, b x2, c x1) -> ttr 0.5, hapax 1/3
            (1, "a a a b b c", "en", "S1"),
            # S2: every token unique -> ttr 1.0, hapax 1.0
            (2, "x y z", "en", "S2"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in
           text.lexical_diversity(docs, "source").collect()}
    s1 = out["S1"]
    assert (s1["n_tokens"], s1["n_types"]) == (6, 3)
    assert s1["ttr"] == 0.5 and s1["hapax_ratio"] == round(1 / 3, 6)
    s2 = out["S2"]
    assert s2["ttr"] == 1.0 and s2["hapax_ratio"] == 1.0


def test_zipf_slope_exact_power_law(spark):
    # construct frequencies c_r = 1024 / r for r=1,2,4,...: a perfect
    # slope -1 line in (ln r, ln c); realized by repeating distinct tokens
    rows = []
    for r in (1, 2, 4, 8, 16):
        rows.append((r, " ".join(f"t{r}" for _ in range(1024 // r))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = text.zipf_slope(docs, top_n=5).collect()[0]
    assert out["n_terms"] == 5
    # ranks are 1,2,3,4,5 but counts are 1024/1,1024/2,1024/4... -> not
    # exactly -1; recompute expected OLS on the true (rank, count) pairs
    import math

    xs = [math.log(i + 1) for i in range(5)]
    ys = [math.log(1024 // r) for r in (1, 2, 4, 8, 16)]
    n = 5
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert out["slope"] == round(slope, 6)


def test_compression_ratio_orders_repetitive_below_prose(spark):
    from ascii_hydra_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam " * 20),
            (2, "the quick brown fox jumps over the lazy dog while seven "
                "wizards brew quartz elixirs at midnight under neon skies "
                "and every sentence introduces new vocabulary entirely"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.compression_ratio(docs).collect()}
    assert out[1]["ratio"] < out[2]["ratio"]  # repetition compresses harder
    assert 0.0 < out[1]["ratio"] < 1.0
    assert out[3]["ratio"] is None and out[3]["n_bytes"] == 0
    assert out[2]["n_bytes"] == len(
        "the quick brown fox jumps over the lazy dog while seven "
        "wizards brew quartz elixirs at midnight under neon skies "
        "and every sentence introduces new vocabulary entirely"
    )


def test_gopher_quality_flags_rule_by_rule(spark):
    # one doc per failure mode + one that passes every rule
    good = "the quick brown fox jumps over the lazy dog with zeal"  # 11 words
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "the of and"),  # 3 words -> word-count fail
            (3, "the ab cd ef gh ij kl mn op qr st"),  # mean len 2.2 -> fail
            (4, "the ## ## ## word with more words here now ok"),  # symbols
            (5, "the 11 22 33 44 55 66 77 88 99 00"),  # alpha ratio fail
            (6, "zz yy xx ww vv uu tt ss rr qq pp"),  # no stop words
        ],
        "doc_id long, text string",
    )
    out = {
        r["id"]: r
        for r in text.gopher_quality_flags(
            docs, min_words=5, max_words=100, min_stop_words=1
        ).collect()
    }
    assert out[1]["passes"] is True
    assert out[2]["ok_word_count"] is False and out[2]["passes"] is False
    assert out[3]["ok_mean_word_len"] is False  # 24 chars / 11 words < 3
    assert out[4]["ok_symbol_ratio"] is False
    assert out[4]["symbol_word_ratio"] == pytest.approx(6 / 11, abs=1e-6)
    assert out[5]["ok_alpha_ratio"] is False
    assert out[5]["alpha_word_ratio"] == pytest.approx(1 / 11, abs=1e-6)
    assert out[6]["ok_stop_words"] is False and out[6]["n_stop_words"] == 0
    assert out[1]["n_stop_words"] == 2  # 'the', 'with'


def test_gopher_quality_flags_empty_text_is_null_not_error(spark):
    docs = spark.createDataFrame([(1, "")], "doc_id long, text string")
    row = text.gopher_quality_flags(docs).collect()[0]
    assert row["n_words"] == 0
    assert row["mean_word_len"] is None  # ANSI-safe: NULL, not an error
    assert row["passes"] is None or row["passes"] is False


def test_mojibake_stats_families_and_clean_ascii(spark):
    cases = {
        "plain ascii text, no damage": 0,
        "cafÃ© latin-1 double decode": 1,      # Ã©
        "donâ€™t and â€“dash": 2,  # â€™ + â€“
        "Â« guillemet artifact": 1,            # Â«
        "lost � byte": 1,
        "café real accents stay clean": 0,          # é alone is FINE
        "Ã©Ã¼ two artifacts": 2,     # Ã© + Ã¼
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id long, text string"
    )
    out = {r["id"]: r["n_artifacts"] for r in text.mojibake_stats(df).collect()}
    want = {i: n for i, n in enumerate(cases.values())}
    assert out == want


def test_strip_invisible_chars_exact(spark):
    cases = {
        "foo\u200bbar": "foobar",            # zero-width space
        "a\u200c\u200d\u00adb": "ab",        # ZWNJ/ZWJ/soft hyphen
        "\ufeffdoc start": "doc start",      # BOM
        "nb\u00a0sp": "nb sp",               # NBSP -> real space
        "l\u200er\u200fmarks": "lrmarks",    # directional marks
        "plain": "plain",
    }
    df = spark.createDataFrame([(t,) for t in cases], "t string")
    out = {
        r["t"]: r["c"]
        for r in df.select(
            "t", text.strip_invisible_chars("t").alias("c")
        ).collect()
    }
    assert out == cases


def test_html_to_text_extraction_semantics(spark):
    cases = {
        # subtrees removed wholesale, not just their tags
        "<head><title>T</title></head><body>x</body>": "x",
        "<script>var a = '<p>not text</p>';</script>hi": "hi",
        "<STYLE>p { }</STYLE>ok": "ok",  # case-insensitive
        "a<script>\nmulti\nline\n</script>b": "a b",  # (?s) spans lines
        "a<!-- <b>comment</b> -->b": "a b",
        # entity decoding, &amp; last (no double decode)
        "&amp;lt; stays": "&lt; stays",
        "x&nbsp;&quot;y&#39;s&quot;&nbsp;&gt;": 'x "y\'s" >',
        # whitespace collapse + trim
        "  <p>a</p>\n\n<p>b</p>  ": "a b",
        "plain text": "plain text",
        # truncated crawl body: an UNCLOSED script must not leak source
        "<p>hi</p><script>var a=1;doc": "hi",
        "a<style>p{": "a",
        "a<!-- cut off": "a",
        # a body cut inside <head> must not leak title/meta text
        # (round-7 advisor finding)
        "<html><head><title>Leaky title": "",
        "pre<head><meta x": "pre",
        # <header>/<headline> are CONTENT tags — word-bounded patterns
        # must not treat them as a head subtree
        "<header>real nav text</header>rest": "real nav text rest",
        "<head class=x><title>T</title></head>y": "y",
        "<script defer src='x'>junk</script>z": "z",
    }
    df = spark.createDataFrame([(h,) for h in cases], "html string")
    out = {
        r["html"]: r["t"]
        for r in df.select("html", text.html_to_text("html").alias("t")).collect()
    }
    assert out == cases
