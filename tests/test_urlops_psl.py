"""publicsuffix.org canonical test vectors (tests.txt, public content)
against ``registrable_domain``'s vendored snapshot — VERDICT r7 #6.

Each pair is a checkPublicSuffix(host, expected_registrable) line from
the upstream test file, restricted to the ASCII vectors the snapshot
covers (IDN/punycode vectors are out of scope: ``url_host`` does not
punycode-fold, documented in the module docstring). The implicit-``*``
rule, wildcard rules, exception rules, and the longest-match tiebreak
all get exercised here exactly the way the upstream suite exercises
them.
"""

from __future__ import annotations

import pytest

from knightshift_spark.operators.urlops import registrable_domain

# (host, expected registrable domain or None) — publicsuffix.org tests.txt
VECTORS = [
    # Mixed case / plain com family
    ("COM", None),
    ("example.COM", "example.com"),
    ("WwW.example.COM", "example.com"),
    ("com", None),
    ("example.com", "example.com"),
    ("b.example.com", "example.com"),
    ("a.b.example.com", "example.com"),
    # Unlisted TLD (implicit * rule)
    ("example", None),
    ("example.example", "example.example"),
    ("b.example.example", "example.example"),
    ("a.b.example.example", "example.example"),
    # TLD with only one rule (implicit here: biz is single-label)
    ("biz", None),
    ("domain.biz", "domain.biz"),
    ("b.domain.biz", "domain.biz"),
    ("a.b.domain.biz", "domain.biz"),
    # Listed private-section suffix (CentralNic uk.com)
    ("uk.com", None),
    ("example.uk.com", "example.uk.com"),
    ("b.example.uk.com", "example.uk.com"),
    ("a.b.example.uk.com", "example.uk.com"),
    ("test.ac", "test.ac"),
    # TLD with only one wildcard rule
    ("mm", None),
    ("c.mm", None),
    ("b.c.mm", "b.c.mm"),
    ("a.b.c.mm", "b.c.mm"),
    # More complex TLD (jp: 2LDs, geo names, city wildcards + exceptions)
    ("jp", None),
    ("test.jp", "test.jp"),
    ("www.test.jp", "test.jp"),
    ("ac.jp", None),
    ("test.ac.jp", "test.ac.jp"),
    ("www.test.ac.jp", "test.ac.jp"),
    ("kyoto.jp", None),
    ("test.kyoto.jp", "test.kyoto.jp"),
    ("ide.kyoto.jp", None),
    ("b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("a.b.ide.kyoto.jp", "b.ide.kyoto.jp"),
    ("c.kobe.jp", None),
    ("b.c.kobe.jp", "b.c.kobe.jp"),
    ("a.b.c.kobe.jp", "b.c.kobe.jp"),
    ("city.kobe.jp", "city.kobe.jp"),
    ("www.city.kobe.jp", "city.kobe.jp"),
    # TLD with a wildcard rule and exceptions (ck)
    ("ck", None),
    ("test.ck", None),
    ("b.test.ck", "b.test.ck"),
    ("a.b.test.ck", "b.test.ck"),
    ("www.ck", "www.ck"),
    ("www.www.ck", "www.ck"),
    # US k12 hierarchy
    ("us", None),
    ("test.us", "test.us"),
    ("www.test.us", "test.us"),
    ("ak.us", None),
    ("test.ak.us", "test.ak.us"),
    ("www.test.ak.us", "test.ak.us"),
    ("k12.ak.us", None),
    ("test.k12.ak.us", "test.k12.ak.us"),
    ("www.test.k12.ak.us", "test.k12.ak.us"),
    # The suffix VERDICT r7 called out as silently mis-grouped before
    ("com.co", None),
    ("example.com.co", "example.com.co"),
    ("b.example.com.co", "example.com.co"),
]


def test_psl_canonical_vectors(spark):
    rows = [(i, f"http://{host}/x") for i, (host, _) in enumerate(VECTORS)]
    docs = spark.createDataFrame(rows, "i long, url string")
    got = {
        r["i"]: r["domain"]
        for r in registrable_domain(docs).select("i", "domain").collect()
    }
    mismatches = [
        (host, expected, got[i])
        for i, (host, expected) in enumerate(VECTORS)
        if got[i] != expected
    ]
    assert not mismatches, mismatches


def test_psl_vectors_match_duckdb_oracle(spark):
    """The same vectors through a pure-SQL PSL resolver in DuckDB —
    proves the Spark plan (explode candidates -> rule join -> prevail)
    is an engine-portable expression of the PSL algorithm, not
    Spark-lucky behavior."""
    import duckdb

    from knightshift_spark.operators.urlops import (
        DEFAULT_PUBLIC_SUFFIXES,
        suffix_rules,
    )

    rules = [
        (r.match, r.ps_labels, r.is_exception)
        for r in suffix_rules(spark, DEFAULT_PUBLIC_SUFFIXES).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE rules(match text, ps_labels int, is_exception boolean)"
    )
    con.executemany("INSERT INTO rules VALUES (?, ?, ?)", rules)
    con.execute("CREATE TABLE hosts(host text)")
    con.executemany(
        "INSERT INTO hosts VALUES (?)", [(h.lower(),) for h, _ in VECTORS]
    )
    sql = """
    WITH cand AS (
      SELECT host, len(string_split(host, '.')) AS n,
             array_to_string(list_slice(string_split(host, '.'),
                 len(string_split(host, '.')) - i + 1,
                 len(string_split(host, '.'))), '.') AS match
      FROM hosts, generate_series(1, 5) AS t(i)
      WHERE i <= len(string_split(host, '.'))
    ), matched AS (
      SELECT c.host, c.n,
             max(CASE WHEN r.is_exception THEN r.ps_labels END) AS exc,
             max(CASE WHEN NOT r.is_exception THEN r.ps_labels END) AS ps
      FROM cand c JOIN rules r USING (match)
      WHERE r.is_exception OR c.n >= r.ps_labels
      GROUP BY c.host, c.n
    )
    SELECT h.host,
           CASE WHEN len(string_split(h.host, '.')) <= coalesce(m.exc, m.ps, 1)
                THEN NULL
                ELSE array_to_string(list_slice(string_split(h.host, '.'),
                     len(string_split(h.host, '.')) - coalesce(m.exc, m.ps, 1),
                     len(string_split(h.host, '.'))), '.')
           END AS domain
    FROM hosts h LEFT JOIN matched m ON h.host = m.host
    """
    duck = {row[0]: row[1] for row in con.execute(sql).fetchall()}
    expected = {h.lower(): e for h, e in VECTORS}
    assert duck == expected


def test_full_psl_cardinality_keeps_plan_shape_and_answers(spark):
    """VERDICT r9 #8: the ``rules=`` escape hatch at REAL public-suffix
    -list cardinality (~9.5k rules, synthesized to mirror the upstream
    mix of plain/wildcard/exception entries across generated ccTLD
    families). The resolver must keep its plan shape — the rule table
    broadcast (one BroadcastHashJoin against the exploded candidates),
    no cartesian product — and answer the canonical vectors
    identically, because rule SEMANTICS are cardinality-independent.
    Timing note: resolution over 1k distinct hosts with the 9.5k-rule
    table runs in the same per-job band as the vendored ~600-rule
    snapshot on local[32] (the rule side is a broadcast either way)."""
    import itertools
    import time

    from pyspark.sql import functions as F

    from knightshift_spark.operators.urlops import (
        DEFAULT_PUBLIC_SUFFIXES,
        registrable_domain,
        suffix_rules,
    )
    from knightshift_spark.plans.partitioning import explain_str

    # synthetic full-size list: keep every vendored rule (correctness
    # anchors) and pad with generated families to upstream cardinality
    import string

    pad = []
    for a, b in itertools.product(string.ascii_lowercase, repeat=2):
        tld = f"{a}{b}x"
        pad.append(tld)
        for second in ("co", "org", "gov", "net", "ac", "sch", "edu",
                       "mil", "int", "museum", "k12"):
            pad.append(f"{second}.{tld}")
        pad.append(f"*.ck{a}{b}.{tld}")
        pad.append(f"!www.ck{a}{b}.{tld}")
    full = tuple(DEFAULT_PUBLIC_SUFFIXES) + tuple(pad)
    assert len(full) >= 9000
    rls = suffix_rules(spark, rules=full)
    assert rls.count() >= 9000

    hosts = [
        ("https://example.com/",), ("https://a.b.example.co.uk/x",),
        ("https://foo.www.ckaa.aax/",),   # exception rule !www.ckaa.aax
        ("https://x.y.ckab.abx/",),       # wildcard *.ckab.abx
        ("https://sub.name.co.aax/",),    # generated co.<tld>
    ] + [(f"https://host{i}.example{i % 37}.co.abx/p",) for i in range(1000)]
    docs = spark.createDataFrame(hosts, "url string")
    out = registrable_domain(docs, rules=rls)
    plan = explain_str(out)
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # rule table stays broadcast

    t0 = time.time()
    got = {r["url"]: r["domain"] for r in out.collect()}
    wall = time.time() - t0
    assert got["https://example.com/"] == "example.com"
    assert got["https://a.b.example.co.uk/x"] == "example.co.uk"
    assert got["https://foo.www.ckaa.aax/"] == "www.ckaa.aax"  # exception
    assert got["https://x.y.ckab.abx/"] == "x.y.ckab.abx"  # wildcard: suffix=y.ckab.abx
    assert got["https://sub.name.co.aax/"] == "name.co.aax"
    assert got["https://host3.example3.co.abx/p"] == "example3.co.abx"
    assert wall < 60  # same per-job band as the vendored snapshot
