"""robots.txt parsing + gating semantics (RFC 9309 longest-match
prefix subset, see operators/crawl.py): group binding, comment
stripping, empty-Disallow, longest-match with Allow tie-break, and the
most-specific-group rule (an agent with its OWN group must not also
inherit the * group)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ascii_hydra_spark.operators import crawl

BODY = (
    "# global politeness file\n"
    "User-agent: evilbot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: *\n"
    "Disallow: /private  # members only\n"
    "Allow: /private/ok\n"
    "Disallow: /tmp\n"
    "Disallow:\n"
    "Crawl-delay: 5\n"
)


def _rules(spark, hosts=("a.example.com",)):
    df = spark.createDataFrame([(h, BODY) for h in hosts], "host string, body string")
    return crawl.parse_robots_rules(df)


def test_parse_binds_rules_to_agent_groups(spark):
    rows = {
        (r["agent"], r["rule"], r["path"])
        for r in _rules(spark).collect()
    }
    assert rows == {
        ("evilbot", "disallow", "/"),
        ("*", "disallow", "/private"),  # comment stripped, value trimmed
        ("*", "allow", "/private/ok"),
        ("*", "disallow", "/tmp"),
        ("*", "disallow", ""),  # empty value kept; matches nothing
    }


def _gate(spark, paths, agent):
    urls = spark.createDataFrame(
        [(i, f"http://A.example.com{p}") for i, p in enumerate(paths)],
        "id long, url string",
    )
    out = crawl.robots_gate(urls, _rules(spark), "id", "url", agent=agent)
    by_id = {r["id"]: r["allowed"] for r in out.collect()}
    return [by_id[i] for i in range(len(paths))]


def test_gate_longest_match_and_tie_semantics(spark):
    got = _gate(
        spark,
        ["/public/x", "/private/x", "/private/ok/x", "/tmp/x", "/", "/privateer"],
        agent="*",
    )
    #             no match  deny       allow>deny    deny     no match
    # NOTE /privateer: prefix matching is CHARACTER prefix per RFC 9309
    # (no path-segment boundary), so Disallow /private matches it
    assert got == [True, False, True, False, True, False]


def test_gate_agent_specific_group_excludes_star(spark):
    # evilbot has its OWN group (Disallow /): the * group's Allow
    # /private/ok must NOT leak in — everything is denied
    got = _gate(spark, ["/public/x", "/private/ok/x", "/"], agent="evilbot")
    assert got == [False, False, False]


def test_gate_unknown_agent_falls_back_to_star(spark):
    got = _gate(spark, ["/private/x", "/private/ok/x"], agent="newbot")
    assert got == [False, True]


def test_gate_host_without_rules_allows(spark):
    urls = spark.createDataFrame(
        [(0, "http://other.example.org/private/x")], "id long, url string"
    )
    out = crawl.robots_gate(urls, _rules(spark), "id", "url").collect()
    assert out[0]["allowed"] is True


def test_gate_no_unpartitioned_window_and_rowcount(spark):
    from tests.test_distrank import assert_no_unpartitioned_window

    urls = spark.createDataFrame(
        [(i, f"http://a.example.com/private/{i}") for i in range(100)],
        "id long, url string",
    )
    out = crawl.robots_gate(urls, _rules(spark), "id", "url")
    assert out.count() == 100  # one row per input URL, rules never fan out
    # the parse window partitions by host; the gate has no window at all
    assert_no_unpartitioned_window(out)
