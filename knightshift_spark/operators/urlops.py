"""URL analysis for corpus curation — host/domain keys, canonical forms.

Web-scale curation is organized AROUND urls: domain blocklists, per-
domain quotas, dedup on the canonical url, provenance joins (C4 filters
by blocklist, RefinedWeb by curated domain rules). Everything here is a
native column expression (regexp + higher-order array functions) —
JVM-side, codegen, zero Python — and every function has an exact DuckDB
twin in the tests, so the keys these produce are engine-portable.

Parsing is RFC-3986-lite by design: scheme://host[:port]/path?query#frag
via anchored character-class regexes (the same on Java and RE2). It does
not chase edge cases a crawler never emits (IPv6 hosts, userinfo) —
documents with such urls keep a stable, if unnormalized, key.

``url_domain`` is the NAIVE last-N-labels registrable domain. A public
suffix list (co.uk, com.au, ...) is data, not code — load one into
``registrable_domain``'s suffix table when available; the naive form is
the deterministic fallback and is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query parameters that never change content identity (tracking)
TRACKING_PARAMS = ("utm_[^=]*", "fbclid", "gclid", "msclkid", "ref")

_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"


def url_host(url: Column) -> Column:
    """Lowercased host: authority minus port. Empty string when the
    value does not parse as an absolute url."""
    auth = F.regexp_extract(url, _AUTHORITY, 1)
    return F.lower(F.regexp_replace(auth, r":\d+$", ""))


def url_domain(url: Column, levels: int = 2) -> Column:
    """Naive registrable domain: the last ``levels`` dot-labels of the
    host (``a.b.example.com`` -> ``example.com``). See the module
    docstring for the public-suffix caveat."""
    host = url_host(url)
    parts = F.split(host, r"\.")
    n = F.size(parts)
    return F.when(n <= levels, host).otherwise(
        F.concat_ws(".", F.slice(parts, n - levels + 1, levels))
    )


def normalize_url(url: Column, strip_params: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """Canonical url for dedup/join keys:

    - fragment stripped (never sent to the server);
    - scheme + authority lowercased (path stays case-sensitive);
    - a leading ``www.`` dropped (the standard canonical-host rule —
      ``www.example.com`` and ``example.com`` key identically);
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - tracking query params removed (``strip_params`` regexes, anchored
      to the param name) and the survivors SORTED — parameter order is
      transport noise, so ``?b=2&a=1`` and ``?a=1&b=2`` key identically;
    - a bare ``?`` or a root path's trailing ``/`` dropped.
    """
    u = F.regexp_replace(F.trim(url), r"#.*$", "")  # fragment
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    head = F.lower(head)
    head = F.regexp_replace(head, r"^([A-Za-z0-9+.-]*://)www\.", r"$1")
    head = F.regexp_replace(head, r"^(http://[^/?#]*):80$", r"$1")
    head = F.regexp_replace(head, r"^(https://[^/?#]*):443$", r"$1")
    # split tail into path and query; drop tracking params; sort the rest
    path = F.substring_index(tail, "?", 1)
    has_q = F.instr(tail, "?") > 0
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    name_rx = "^(" + "|".join(strip_params) + ")="
    kept = F.sort_array(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(name_rx),
        )
    )
    qnorm = F.when(
        has_q & (F.size(kept) > 0), F.concat(F.lit("?"), F.concat_ws("&", kept))
    ).otherwise(F.lit(""))
    path = F.regexp_replace(path, r"^/$", "")  # root slash is implicit
    return F.concat(head, path, qnorm)


# --- Public-suffix (PSL) registrable domain -------------------------------
#
# Vendored SNAPSHOT of publicsuffix.org entries (data, not code): the
# most common multi-label public suffixes plus the canonical wildcard /
# exception cases, enough for real co.uk-style grouping. The full list
# (~9k rules) is a drop-in replacement — pass it as ``rules`` — because
# rule SEMANTICS (longest match, ``*.`` wildcards, ``!`` exceptions,
# implicit ``*`` default) are implemented here, not baked per entry.
DEFAULT_PUBLIC_SUFFIXES: tuple[str, ...] = (
    # United Kingdom
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk", "sch.uk", "nhs.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "id.au", "asn.au",
    # Japan
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    # Brazil / Latin America
    "com.br", "net.br", "org.br", "gov.br", "com.mx", "org.mx", "gob.mx",
    "com.ar", "org.ar", "gob.ar",
    # Asia
    "co.kr", "or.kr", "go.kr", "co.in", "org.in", "gov.in", "ac.in",
    "com.cn", "org.cn", "gov.cn", "net.cn", "com.tw", "org.tw",
    "com.sg", "org.sg", "com.hk", "org.hk", "co.id", "or.id",
    "com.my", "org.my", "co.th", "or.th", "com.vn", "org.vn",
    # Africa / Oceania / Europe multi-label
    "co.za", "org.za", "gov.za", "co.nz", "org.nz", "govt.nz",
    "com.tr", "org.tr", "gov.tr", "co.il", "org.il", "gov.il",
    "com.pl", "org.pl", "net.pl", "com.ua", "org.ua", "gov.ua",
    "com.gr", "org.gr", "com.pt", "org.pt", "com.ro", "org.ro",
    # canonical wildcard + exception family (publicsuffix.org test set)
    "*.ck", "!www.ck", "*.bd", "*.kawasaki.jp", "!city.kawasaki.jp",
)

_MAX_SUFFIX_LABELS = 5  # longest vendored rule (incl. wildcard slot)


def suffix_rules(spark, rules: tuple[str, ...] = DEFAULT_PUBLIC_SUFFIXES) -> DataFrame:
    """PSL rules normalized for the match join: (match, ps_labels,
    is_exception) where ``match`` is the literal host-suffix string the
    rule matches on and ``ps_labels`` the public-suffix label count IF
    that rule prevails — a wildcard rule ``*.ck`` matches on its parent
    ``ck`` but yields one extra label; an exception ``!www.ck`` matches
    on ``www.ck`` and yields one fewer."""
    rows = []
    for r in rules:
        r = r.strip().lower()
        if not r or r.startswith("//"):
            continue
        if r.startswith("!"):
            body = r[1:]
            rows.append((body, body.count(".") + 1 - 1, True))
        elif r.startswith("*."):
            parent = r[2:]
            rows.append((parent, parent.count(".") + 1 + 1, False))
        else:
            rows.append((r, r.count(".") + 1, False))
    return spark.createDataFrame(
        rows, "match string, ps_labels int, is_exception boolean"
    )


def registrable_domain(
    docs: DataFrame,
    url_col: str = "url",
    out_col: str = "domain",
    rules: DataFrame | None = None,
) -> DataFrame:
    """PSL-correct registrable domain (VERDICT r6 #7 — the fix for
    ``url_domain``'s naive 2-label grouping): public suffix by longest
    matching rule with wildcard/exception/implicit-``*`` semantics, then
    registrable = suffix + one label. Hosts that ARE a public suffix
    (``co.uk`` itself) get NULL — there is no registrant.

    Scale shape: the ≤``_MAX_SUFFIX_LABELS`` candidate suffixes explode
    from each DISTINCT host (not each row), join the broadcast rule
    table, reduce to one prevailing rule per host, and broadcast back
    onto the corpus — the corpus side never shuffles."""
    spark = docs.sparkSession
    rls = rules if rules is not None else suffix_rules(spark)
    hosts = docs.select(url_host(F.col(url_col)).alias("__host")).distinct()
    parts = F.split(F.col("__host"), r"\.")
    n = F.size(parts)
    cand = hosts.select(
        "__host",
        n.alias("__n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.least(n, F.lit(_MAX_SUFFIX_LABELS))),
                lambda i: F.concat_ws(".", F.slice(parts, n - i + 1, i)),
            )
        ).alias("match"),
    )
    # prevailing rule: any exception wins outright (PSL §algorithm 3);
    # otherwise the longest ps_labels among matches; no match → the
    # implicit '*' default rule (ps = 1 label)
    matched = (
        cand.join(F.broadcast(rls), "match")
        # PSL label-count requirement: a rule only matches hosts with at
        # least as many labels as the rule itself. Only wildcards can
        # exceed the matched parent (rule labels == ps_labels for both
        # normal and wildcard rows; exceptions always satisfy it)
        .filter(F.col("is_exception") | (F.col("__n") >= F.col("ps_labels")))
        .groupBy("__host", "__n")
        .agg(
            F.max(F.when(F.col("is_exception"), F.col("ps_labels"))).alias("__exc"),
            F.max(F.when(~F.col("is_exception"), F.col("ps_labels"))).alias("__ps"),
        )
        .select(
            "__host",
            F.coalesce("__exc", "__ps").alias("__ps"),
        )
    )
    resolved = (
        hosts.join(matched, "__host", "left")
        .select(
            "__host",
            F.coalesce("__ps", F.lit(1)).alias("__ps"),
        )
        .withColumn(
            out_col,
            F.when(F.size(F.split(F.col("__host"), r"\.")) <= F.col("__ps"), F.lit(None).cast("string"))
            .otherwise(
                F.concat_ws(
                    ".",
                    F.slice(
                        F.split(F.col("__host"), r"\."),
                        F.size(F.split(F.col("__host"), r"\.")) - F.col("__ps"),
                        F.col("__ps") + 1,
                    ),
                )
            ),
        )
        .select("__host", out_col)
    )
    keyed = docs.withColumn("__host", url_host(F.col(url_col)))
    return keyed.join(F.broadcast(resolved), "__host", "left").drop("__host")


def domain_stats(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str | None = "text",
    levels: int = 2,
    psl: bool = False,
    rules: DataFrame | None = None,
) -> DataFrame:
    """Per-domain rollup: (domain, n_docs[, total_chars]) — the sizing
    pass behind domain quotas and blocklist candidates. One map-side-
    combinable shuffle on the domain key. ``psl=True`` groups by the
    PSL-correct ``registrable_domain`` (broadcast rule join; co.uk-style
    hosts group right) instead of the naive last-``levels`` labels."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if text_col is not None:
        aggs.append(
            F.coalesce(F.sum(F.length(text_col)), F.lit(0)).alias("total_chars")
        )
    if psl:
        keyed = registrable_domain(docs, url_col, out_col="__psl_dom", rules=rules)
        return keyed.groupBy(F.col("__psl_dom").alias("domain")).agg(*aggs)
    return docs.groupBy(url_domain(F.col(url_col), levels).alias("domain")).agg(*aggs)


def filter_domains(
    docs: DataFrame,
    domains: list[str] | DataFrame,
    url_col: str = "url",
    mode: str = "block",
    levels: int = 2,
    psl: bool = False,
    rules: DataFrame | None = None,
) -> DataFrame:
    """Domain allow/block filtering on the registrable domain.

    ``domains`` as a list compiles to a broadcast-literal ``isin`` (the
    C4 blocklist is thousands of entries — expression-sized); as a
    DataFrame with a ``domain`` column it joins semi/anti (the right
    form when the list is itself corpus-derived). ``mode``: ``block``
    drops matching domains, ``allow`` keeps only them. ``psl=True``
    keys on the PSL-correct ``registrable_domain`` — a blocklist entry
    ``example.co.uk`` then matches every ``*.example.co.uk`` host,
    which the naive 2-label key grouped under ``co.uk``.
    """
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    if psl:
        keyed = registrable_domain(docs, url_col, out_col="__dom", rules=rules)
        if isinstance(domains, DataFrame):
            how = "left_anti" if mode == "block" else "left_semi"
            return keyed.join(
                domains.select(F.col("domain").alias("__dom")), "__dom", how
            ).drop("__dom")
        hit = F.col("__dom").isin([d.lower() for d in domains])
        return keyed.filter(~hit if mode == "block" else hit).drop("__dom")
    dom = url_domain(F.col(url_col), levels)
    if isinstance(domains, DataFrame):
        keyed = docs.withColumn("__dom", dom)
        how = "left_anti" if mode == "block" else "left_semi"
        out = keyed.join(
            domains.select(F.col("domain").alias("__dom")), "__dom", how
        )
        return out.drop("__dom")
    hit = dom.isin([d.lower() for d in domains])
    return docs.filter(~hit if mode == "block" else hit)
