"""Bounded public-suffix snapshot for registered-domain (eTLD+1) keys.

The reference's production crawl pipeline aggregates its hyperlink graph
"to the domain level" (reference papers/multi_platform_orchestration/
paper.md:150-155, the GraphAggr step) — i.e. the registered domain
(eTLD+1), where ``cdn.example.net`` and ``example.net`` are ONE node but
``a.github.io`` and ``b.github.io`` are TWO (github.io is itself a
public suffix). Resolving that grain needs a public-suffix list; this
module embeds a deterministic, bounded SNAPSHOT of the well-known
publicsuffix.org list (ICANN multi-label registry suffixes for the
major ccTLDs plus the hosting-platform private suffixes that dominate
web crawls), so the operator — and its DuckDB oracle — never depend on
a network fetch or an external package.

Documented subset vs the full PSL (~9k rules):

- plain rules only, to depth 3; wildcard TLD rules (``*.bd`` ...) are
  carried as :data:`WILDCARD_TLDS` (any 2nd-level label under them is a
  suffix); EXCEPTION rules (``!www.ck``) are not in the snapshot;
- long-tail ccTLD registries and vanity gTLD private suffixes are
  omitted — unknown TLDs fall back to the PSL's own prevailing ``*``
  rule (the bare TLD is the suffix), which is exactly what the full
  list prescribes for unlisted TLDs;
- rules are matched case-insensitively downstream because SURT hosts
  are already lowercased.

Scale shape: the snapshot is a few hundred strings — it compiles into
constant literal arrays inside whole-stage codegen (no join, no
shuffle, no broadcast needed), so the registered-domain key costs one
array membership probe per row at any corpus size.

Rules are AUTHORED in natural dotted form for auditability and exposed
in the reversed comma-joined form SURT hosts use (``co.uk`` ->
``uk,co``), so suffix matching is a label-prefix test on the SURT key.
"""

from __future__ import annotations

# --- ICANN section: multi-label registry suffixes (common subset) ----
_ICANN_DEPTH2: tuple[str, ...] = (
    # .uk
    "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk", "nhs.uk",
    "org.uk", "plc.uk", "police.uk", "sch.uk",
    # .au
    "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au", "org.au",
    # .br
    "art.br", "com.br", "edu.br", "gov.br", "mil.br", "net.br", "org.br",
    # .jp
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    # .nz
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "mil.nz", "net.nz", "org.nz", "school.nz",
    # .za
    "ac.za", "co.za", "edu.za", "gov.za", "mil.za", "net.za", "org.za",
    "web.za",
    # .in
    "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in", "ind.in",
    "mil.in", "net.in", "nic.in", "org.in", "res.in",
    # .cn
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn", "org.cn",
    # .mx / .ar / .tr
    "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "net.ar", "org.ar",
    "av.tr", "com.tr", "edu.tr", "gov.tr", "mil.tr", "net.tr", "org.tr",
    "web.tr",
    # .kr / .tw / .hk / .sg
    "ac.kr", "co.kr", "go.kr", "mil.kr", "ne.kr", "or.kr", "pe.kr",
    "re.kr",
    "com.tw", "edu.tw", "gov.tw", "idv.tw", "mil.tw", "net.tw", "org.tw",
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # .il / .id / .th / .ua
    "ac.il", "co.il", "gov.il", "muni.il", "net.il", "org.il",
    "ac.id", "biz.id", "co.id", "go.id", "mil.id", "my.id", "net.id",
    "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    # .pl / .ru (legacy commons) / .fr / .it / .es / .pt / .gr
    "biz.pl", "com.pl", "edu.pl", "gov.pl", "info.pl", "net.pl", "org.pl",
    "com.ru", "net.ru", "org.ru", "pp.ru",
    "asso.fr", "com.fr", "gouv.fr", "nom.fr",
    "edu.it", "gov.it",
    "com.es", "edu.es", "gob.es", "nom.es", "org.es",
    "com.pt", "edu.pt", "gov.pt", "net.pt", "org.pt",
    "com.gr", "edu.gr", "gov.gr", "net.gr", "org.gr",
    # .co (Colombia)
    "com.co", "edu.co", "gov.co", "mil.co", "net.co", "nom.co", "org.co",
    # .ca provincial
    "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca",
    "ns.ca", "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca",
    "yk.ca",
)

# --- private section: hosting platforms ubiquitous in web crawls ------
_PRIVATE_DEPTH2: tuple[str, ...] = (
    "github.io", "gitlab.io", "readthedocs.io",
    "blogspot.com", "wordpress.com", "tumblr.com",
    "herokuapp.com", "appspot.com", "firebaseapp.com",
    "netlify.app", "vercel.app", "web.app",
    "pages.dev", "workers.dev", "fly.dev", "onrender.com",
    "glitch.me", "repl.co",
    "azurewebsites.net", "cloudapp.net", "cloudfront.net",
)

_DEPTH3: tuple[str, ...] = (
    # AWS regional/service suffixes (private section)
    "s3.amazonaws.com", "compute.amazonaws.com", "elb.amazonaws.com",
    # .au state education registries (ICANN section)
    "act.edu.au", "nsw.edu.au", "nt.edu.au", "qld.edu.au", "sa.edu.au",
    "tas.edu.au", "vic.edu.au", "wa.edu.au",
)

#: TLDs whose PSL entry is a wildcard rule ``*.<tld>`` — ANY 2nd-level
#: label under them is a public suffix (exception rules not in snapshot).
WILDCARD_TLDS: tuple[str, ...] = (
    "bd", "ck", "er", "fj", "jm", "kh", "mm", "np", "pg", "ye",
)


def _rev(rule: str) -> str:
    return ",".join(reversed(rule.split(".")))


#: Depth-2 suffix rules in reversed comma form (``co.uk`` -> ``uk,co``),
#: sorted for deterministic plan/oracle text.
SUFFIX_RULES_2: tuple[str, ...] = tuple(
    sorted(_rev(r) for r in _ICANN_DEPTH2 + _PRIVATE_DEPTH2)
)

#: Depth-3 suffix rules in reversed comma form, sorted.
SUFFIX_RULES_3: tuple[str, ...] = tuple(sorted(_rev(r) for r in _DEPTH3))

assert all(r.count(",") == 1 for r in SUFFIX_RULES_2)
assert all(r.count(",") == 2 for r in SUFFIX_RULES_3)
assert all("," not in t and "." not in t for t in WILDCARD_TLDS)


def sql_list(rules: "tuple[str, ...]") -> str:
    """The rules as a SQL list literal (``['uk,co', ...]``) — the DuckDB
    oracle replays the suffix match against the SAME snapshot."""
    return "[" + ", ".join("'" + r + "'" for r in rules) + "]"
