"""Crawl-politeness operators: robots.txt parsing and URL gating.

The reference's crawl toolchain (fastwarc/warcio/surt on Databricks,
reference resources/databricks.py:76-78 and the paper.md pipeline)
consumes archives that an upstream crawler produced under robots.txt
rules; re-crawling, selective re-fetch (the CDX path in sources/cdx.py)
and frontier construction all need the same gate. This module evaluates
the rules Spark-first:

- ``parse_robots_rules``: robots.txt BODIES -> flat (host, agent, rule,
  path) rows. Line explode + comment strip + a per-host forward-fill
  window binds each Allow/Disallow to its preceding User-agent line.
- ``robots_gate``: URL set x rules -> allowed boolean under the
  longest-match semantics modern crawlers use (RFC 9309): among all
  rules of the matched agent group whose path is a PREFIX of the URL
  path, the longest wins; Allow wins length ties; no match = allowed.
  An empty ``Disallow:`` value matches nothing (allow-all), per spec.

Scope (documented subset): path patterns are literal PREFIXES — the
RFC's ``*`` wildcards and ``$`` anchors are not interpreted — and a
rule group binds to its single nearest User-agent line (multi-agent
groups listing several agents take the last). Both are the common case
in real robots files and keep every step inside codegen string ops
with a DuckDB closed form.

Scale shape: the rules table is tiny (one row per host x rule — a
frontier of millions of hosts still yields a broadcast-sized table per
partition of hosts); the gate is one equi-join on host + a
(url)-keyed max-struct aggregate, so URL text never shuffles more than
once and the join side AQE-broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def parse_robots_rules(
    robots: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """Flatten robots.txt bodies into (host, agent, rule, path) rows.

    ``rule`` is 'allow' | 'disallow' (lowercased); ``path`` keeps its
    case (URL paths are case-sensitive); comments (# to end of line)
    and unknown directives (crawl-delay, sitemap, ...) drop; rules
    before any User-agent line drop (no group to bind to, per spec).
    """
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("ln", "raw"),
    )
    clean = F.trim(F.regexp_replace(F.col("raw"), "#.*$", ""))
    directive = F.lower(F.trim(F.substring_index(clean, ":", 1)))
    value = F.trim(F.regexp_extract(clean, r"^[^:]*:(.*)$", 1))
    parsed = lines.select(
        "host",
        "ln",
        directive.alias("d"),
        value.alias("v"),
    ).filter(F.col("d").isin("user-agent", "allow", "disallow"))
    w = (
        Window.partitionBy("host")
        .orderBy("ln")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    agent = F.last(
        F.when(F.col("d") == "user-agent", F.lower(F.col("v"))),
        ignorenulls=True,
    ).over(w)
    return (
        parsed.withColumn("agent", agent)
        .filter(F.col("d").isin("allow", "disallow") & F.col("agent").isNotNull())
        .select(
            "host",
            "agent",
            F.col("d").alias("rule"),
            F.col("v").alias("path"),
        )
    )


def robots_gate(
    urls: DataFrame,
    rules: DataFrame,
    id_col: str,
    url_col: str,
    agent: str = "*",
) -> DataFrame:
    """(id, url, host, path, allowed) for every URL row, gated by the
    parsed rules of ``agent`` (exact lowercase match) merged with the
    ``*`` group — longest-prefix wins, Allow wins ties, no match (or
    no rules for the host) allows.

    The length/allow precedence is ONE max over a (length, is_allow)
    struct — Spark and any SQL engine order struct comparisons
    lexicographically by field, so the gate needs no window.
    """
    a = agent.lower()
    r = rules.filter(
        (F.col("agent") == F.lit(a)) | (F.col("agent") == F.lit("*"))
    )
    if a != "*":
        # RFC 9309: the most specific matching group applies, not the
        # union — if the agent has its own group on a host, * drops out
        has_own = (
            rules.filter(F.col("agent") == F.lit(a))
            .select("host")
            .distinct()
            .withColumn("__own", F.lit(1))
        )
        r = (
            r.join(has_own, "host", "left")
            .filter(
                (F.col("agent") == F.lit(a)) | F.col("__own").isNull()
            )
            .drop("__own")
        )
    r = r.select(
        "host",
        F.col("rule").alias("__rrule"),
        F.col("path").alias("__rpath"),
    )
    u = urls.select(
        F.col(id_col).alias("id"),
        F.col(url_col).alias("url"),
        F.lower(
            F.substring_index(
                F.regexp_extract(
                    F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
                ),
                "@",
                -1,
            )
        ).alias("host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col(url_col),
                    r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)",
                    1,
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    j = u.join(r, "host", "left")
    # an EMPTY rule path matches nothing ("Disallow:" = allow all)
    matched = F.col("__rpath").isNotNull() & (
        F.col("__rpath") != ""
    ) & F.col("path").startswith(F.col("__rpath"))
    best = F.max(
        F.when(
            matched,
            F.struct(
                F.length("__rpath").alias("l"),
                (F.col("__rrule") == "allow").cast("int").alias("a"),
            ),
        )
    )
    return (
        j.groupBy("id", "url", "host", "path")
        .agg(best.alias("__best"))
        .select(
            "id",
            "url",
            "host",
            "path",
            (
                F.col("__best").isNull()
                | (F.col("__best.a") == 1)
            ).alias("allowed"),
        )
    )


def wat_outlinks(
    df: DataFrame,
    uri_col: str = "target_uri",
    body_col: str = "body",
) -> DataFrame:
    """(src_surt, dst_surt) hyperlink edges from anchor hrefs in crawled
    HTML — the WAT-outlink table of the Common Crawl trio (WARC bytes ->
    WAT metadata -> WET text). The reference's production pipeline
    builds exactly this interfirm hyperlink graph from crawl dumps
    (reference paper.md:139-167 NodesOnly -> Edges -> Graph -> GraphAggr;
    its Databricks image ships fastwarc/warcio/surt for it —
    resources/databricks.py:76-78); here the extraction is pure codegen
    string ops — ``regexp_extract_all`` for the hrefs, literal
    prefix tests + one concat for resolution, ``surt_url`` for the
    canonical keys — no UDF, so a 1000-executor scan stays whole-stage
    compiled and the only shuffle is whatever the caller aggregates.

    Scope (documented subset, the WAT-parity cases): absolute
    ``http(s)://`` hrefs pass through, protocol-relative ``//host/..``
    adopt the page scheme, root-relative ``/path`` resolve against the
    page origin; fragment-only, ``mailto:``/``javascript:``/other
    schemes, and directory-relative hrefs (no leading slash — rare in
    crawl top-N and ambiguous without <base>) are dropped. ONE regex
    with both quote styles as alternatives anchored to the OPENING
    quote (the captured group keeps the quotes; they're stripped after
    extraction), so an href value embedding the other quote char
    (href="a'b") is captured whole rather than truncated at the
    embedded quote, and each anchor tag yields AT MOST one row — two
    independent per-style regexes would both fire on a tag whose other
    attributes embed an href-looking string. The attribute scan
    ``(?:[^>"']|"[^">]*"|'[^'>]*')*?`` steps over FULLY-QUOTED
    attribute values as units, so a quoted ``href=`` string inside an
    earlier attribute (``data-x='href="/fake"' href='/real'``) can no
    longer shadow the tag's real href; the lazy quantifier still means
    the first real href assignment wins. The quoted-unit branches
    REFUSE to cross ``>`` — a quoted value containing ``>`` (or an
    unclosed quote, common in real crawl HTML) ends the scan at the
    tag boundary instead of letting it escape into body text and
    extract href-looking strings that were never anchors (the
    tag-escape spurious-edge failure a ``"[^"]*"`` branch exhibits).
    Residual documented caveat: an UNQUOTED attribute value containing
    ``href=`` can still shadow — inherent to the tokenizer-free regex
    subset. Unquoted hrefs are dropped. One output row per surviving
    anchor occurrence; callers dedup at their grain (``distinct()``
    for a page graph, groupBy for weighted domain edges).
    """
    from ascii_hydra_spark.functions import surt_url

    href_re = (
        r"""(?i)<a\s(?:[^>"']|"[^">]*"|'[^'>]*')*?"""
        r"""href\s*=\s*("[^"]+"|'[^']+')"""
    )
    quoted = F.explode(
        F.regexp_extract_all(F.col(body_col), F.lit(href_re), F.lit(1))
    )
    base = df.select(
        F.col(uri_col).alias("__uri"), quoted.alias("__q")
    ).select(
        "__uri",
        F.col("__q").substr(F.lit(2), F.length("__q") - 2).alias("__href"),
    )
    scheme = F.regexp_extract(
        F.col("__uri"), r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1
    )
    origin = F.regexp_extract(
        F.col("__uri"), r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)", 1
    )
    h = F.col("__href")
    resolved = (
        F.when(h.rlike(r"^(?i)https?://"), h)
        .when(h.startswith("//"), F.concat(scheme, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        base.select("__uri", resolved.alias("__dst"))
        .filter(F.col("__dst").isNotNull())
        .select(
            surt_url("__uri").alias("src_surt"),
            surt_url("__dst").alias("dst_surt"),
        )
    )


def domain_link_aggr(edges: DataFrame, grain: str = "host") -> DataFrame:
    """(src_domain, dst_domain, n_links, n_src_pages): page-grain SURT
    edges aggregated to domain nodes — the GraphAggr step of the
    reference's crawl-graph pipeline (paper.md:150-167: page edges roll
    up to firm/domain nodes before analysis), at either grain:

    - ``grain="host"``: the node key is the full reversed SURT host
      (everything before ``)``). ``www.`` is already stripped by
      ``surt_url``, but other subdomains are retained, so
      ``cdn.example.net`` and ``example.net`` stay separate nodes.
    - ``grain="etld1"``: the registered domain (eTLD+1) — the grain the
      reference paper's GraphAggr actually uses ("aggregates the graph
      to the domain level", paper.md:150-155). Subdomains collapse into
      one node while hosts on a public suffix (``*.github.io``) stay
      separate; the suffix match replays the publicsuffix.org algorithm
      against the bounded snapshot in ``functions/psl.py`` (constant
      literal arrays — codegen, no extra join/shuffle vs host grain).
      Edges whose src or dst has NO registered domain (the host IS a
      public suffix, or an IP literal) are DROPPED — they have no
      domain-level node.

    The rollup is one substring (+ one constant-array probe for etld1)
    + one keyed aggregate: ``n_links`` counts DISTINCT page-level
    (src, dst) pairs between the two domains and ``n_src_pages`` the
    distinct linking pages. Input edges may repeat (one row per
    anchor); the distinct runs inside the same shuffle as the aggregate
    (partial map-side dedup on the composite key).
    """
    host = lambda c: F.substring_index(F.col(c), ")", 1)  # noqa: E731
    if grain == "host":
        keyed = edges.select(
            host("src_surt").alias("src_domain"),
            host("dst_surt").alias("dst_domain"),
            F.col("src_surt"),
            F.col("dst_surt"),
        )
    elif grain == "etld1":
        from ascii_hydra_spark.functions import registered_domain

        # TWO projections, not one: registered_domain references its
        # input ~10x internally, and a fused select would clone the
        # whole upstream src_surt/dst_surt expression tree (for WAT
        # edges that tree contains surt_url twice) into every
        # reference — a multiplicative plan blowup that turned a
        # 600-row fixture job into tens of seconds of analysis/codegen.
        # Staged through an alias, CollapseProject keeps the split (it
        # only inlines cheap or singly-referenced expressions).
        keyed = (
            edges.select(
                host("src_surt").alias("__src_host"),
                host("dst_surt").alias("__dst_host"),
                F.col("src_surt"),
                F.col("dst_surt"),
            )
            .select(
                registered_domain(F.col("__src_host")).alias("src_domain"),
                registered_domain(F.col("__dst_host")).alias("dst_domain"),
                F.col("src_surt"),
                F.col("dst_surt"),
            )
            .filter(
                F.col("src_domain").isNotNull()
                & F.col("dst_domain").isNotNull()
            )
        )
    else:
        raise ValueError(f"grain must be 'host' or 'etld1', got {grain!r}")
    return (
        keyed.distinct()
        .groupBy("src_domain", "dst_domain")
        .agg(
            F.count("*").cast("bigint").alias("n_links"),
            F.countDistinct("src_surt").cast("bigint").alias("n_src_pages"),
        )
    )
