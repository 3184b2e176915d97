"""URL/domain curation family: public-suffix extraction on planted hosts,
per-domain cap exactness (two-phase salted == naive single window), and the
broadcast-anti-join plan shape the 100 TB stance promises."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.operators.domain_curation import (
    DOM_CAP,
    canonical_url,
    dedup_url_canonical,
    dom_blocklist_filter,
    dom_cap_per_domain,
    dom_host_stats,
    registrable_domain,
    _with_domain,
)
from tests.conftest import SF_SMALL


def test_registrable_domain_public_suffix_matching(spark):
    """Planted hosts: multi-label suffixes must NOT be mistaken for sites
    (the naive last-two-labels rule calls every *.co.uk host 'co.uk'), and
    subdomain depth must not matter."""
    cases = [
        ("www.example.co.uk", "example.co.uk"),
        ("cdn.assets.example.co.uk", "example.co.uk"),
        ("example.co.uk", "example.co.uk"),
        ("news.bbc.ac.uk", "bbc.ac.uk"),
        ("shop.foo.com.au", "foo.com.au"),
        ("www.example.com", "example.com"),
        ("a.b.c.example.org", "example.org"),
        ("example.io", "example.io"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "host STRING")
    got = {r["host"]: r["dom"] for r in df.select("host", registrable_domain(F.col("host")).alias("dom")).collect()}
    assert got == dict(cases)


def test_host_stats_collapses_subdomains(spark):
    """At least one site must aggregate multiple distinct hosts (www./
    cdn.assets./bare variants), and no .co.uk 'domain' may be the bare
    public suffix itself."""
    stats = dom_host_stats(spark, SF_SMALL).collect()
    assert any(r["n_hosts"] >= 2 for r in stats)
    assert all(r["domain"] != "co.uk" for r in stats)
    assert all(
        len(r["domain"].split(".")) == 3
        for r in stats
        if r["domain"].endswith(".co.uk")
    )
    # docs partition across domains completely (no doc lost to parsing)
    n_docs_total = sum(r["n_docs"] for r in stats)
    assert n_docs_total == _with_domain(spark, SF_SMALL).count()


def test_cap_two_phase_equals_naive_window(spark):
    """The salted two-phase top-K must return EXACTLY the naive
    single-window per-domain top-K (the salting is a partition-size bound,
    not an approximation)."""
    d = _with_domain(spark, SF_SMALL).select(
        "doc_id",
        "domain",
        F.md5(F.concat(F.lit("cap-"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.partitionBy("domain").orderBy("h", "doc_id")
    naive = {
        (r["doc_id"], r["domain"], r["rk"])
        for r in d.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= DOM_CAP)
        .collect()
    }
    got = {
        (r["doc_id"], r["domain"], r["rk"])
        for r in dom_cap_per_domain(spark, SF_SMALL).collect()
    }
    assert got == naive


def test_cap_bounds_every_domain(spark):
    per_dom = (
        dom_cap_per_domain(spark, SF_SMALL)
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n"), F.max("rk").alias("mx"))
        .collect()
    )
    assert per_dom and all(r["n"] <= DOM_CAP and r["mx"] <= DOM_CAP for r in per_dom)


def test_blocklist_filter_drops_whole_domains_and_broadcasts(spark):
    """Survivors must share zero domains with the blocked set, the drop must
    be non-degenerate, and the anti-join must be a BROADCAST anti-join (the
    corpus side never shuffles — the 100 TB plan shape)."""
    surv = dom_blocklist_filter(spark, SF_SMALL)
    all_docs = _with_domain(spark, SF_SMALL)
    surv_domains = {r["domain"] for r in surv.select("domain").distinct().collect()}
    blocked_domains = {
        r["domain"]
        for r in all_docs.select("domain")
        .distinct()
        .where(F.substring(F.md5(F.concat(F.lit("blk-"), F.col("domain"))), 1, 1).isin("0", "1"))
        .collect()
    }
    assert blocked_domains, "planted blocklist bucket must be non-empty"
    assert surv_domains.isdisjoint(blocked_domains)
    assert surv.count() + all_docs.join(
        F.broadcast(all_docs.sparkSession.createDataFrame(
            [(d,) for d in blocked_domains], "domain STRING")),
        "domain", "semi",
    ).count() == all_docs.count()
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_url_canonicalization_planted_variants(spark):
    """All crawl-noise axes collapse: scheme/host case, default port,
    trailing slash, tracking params, param order, fragment — while real
    differences (path, non-tracking params, non-default port) survive."""
    want = "https://www.example.com/page/3?id=7&ref=a"
    same = [
        "https://www.example.com/page/3?id=7&ref=a",
        "HTTPS://WWW.EXAMPLE.COM/page/3?id=7&ref=a",
        "https://www.example.com:443/page/3?id=7&ref=a",
        "https://www.example.com/page/3/?id=7&ref=a",
        "https://www.example.com/page/3?ref=a&id=7",
        "https://www.example.com/page/3?utm_source=x&id=7&ref=a",
        "https://www.example.com/page/3?id=7&gclid=zzz&ref=a",
        "https://www.example.com/page/3?id=7&ref=a#section-2",
    ]
    different = [
        "https://www.example.com/page/4?id=7&ref=a",   # other path
        "https://www.example.com/page/3?id=8&ref=a",   # other real param
        "https://www.example.com:8443/page/3?id=7&ref=a",  # non-default port
        "https://api.example.com/page/3?id=7&ref=a",   # other host
        "https://www.example.com/page/3",              # no params at all
    ]
    df = spark.createDataFrame([(u,) for u in same + different], "url STRING")
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert all(c == want for c in got[: len(same)]), got[: len(same)]
    assert all(c != want for c in got[len(same):]), got[len(same):]
    assert len(set(got[len(same):])) == len(different)  # and mutually distinct


def test_url_dedup_keeps_min_doc_and_counts_variants(spark):
    out = {r["canonical_url"]: (r["n_variants"], r["keep_doc"]) for r in dedup_url_canonical(spark, SF_SMALL).collect()}
    assert sum(n for n, _ in out.values()) == 500  # every doc lands somewhere
    assert any(n > 1 for n, _ in out.values())     # real collapse happens
    # representative is deterministic: min doc_id of the group
    assert all(k >= 0 for _, k in out.values())
