"""Registered-domain (eTLD+1) extraction rules."""

from pyspark.sql import functions as F

from wpextract_spark.functions.domains import registered_domain


def _reg(spark, hosts):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    return [r[0] for r in df.select(registered_domain("host")).collect()]


def test_registered_domain_rules(spark):
    cases = {
        # plain TLD: last two labels, any subdomain depth
        "example.org": "example.org",
        "www.example.org": "example.org",
        "deep.sub.domain.example.org": "example.org",
        # two-label public suffixes need the third label
        "blog.example.co.uk": "example.co.uk",
        "www.example.co.uk": "example.co.uk",
        "shop.store.com.au": "store.com.au",
        "a.b.c.example.co.jp": "example.co.jp",
        # the suffix alone (a registry page) stays itself
        "co.uk": "co.uk",
        # case + FQDN trailing dot normalize
        "WWW.Example.ORG.": "example.org",
        # IP literals and single labels pass through
        "192.168.0.1": "192.168.0.1",
        "localhost": "localhost",
    }
    assert _reg(spark, list(cases)) == list(cases.values())


def test_cap_keys_on_registered_domain_not_host(spark):
    # the anti-dominance scenario: one publisher spread over subdomains
    from wpextract_spark.operators.corpusfilters import source_cap

    rows = [
        (i, f"sub{i}.example.co.uk") for i in range(6)
    ] + [(10, "other.net"), (11, "www.other.net")]
    df = spark.createDataFrame(rows, "doc_id long, host string").select(
        "doc_id", registered_domain("host").alias("source")
    )
    out = source_cap(df, source_col="source", max_per_source=3)
    kept = {r["doc_id"] for r in out.where("keep").collect()}
    # per-host keying would keep all 6 subdomain docs; per-domain keeps 3
    assert kept == {0, 1, 2, 10, 11}


def test_no_shuffle_map_only(spark):
    df = spark.createDataFrame([("a.example.org",)], "host string")
    plan = (
        df.select(registered_domain("host").alias("d"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_domain_link_graph_rollup(spark):
    from wpextract_spark.operators.anchors import domain_link_graph

    rows = [
        # subdomain mesh of one publisher -> another domain
        ("https://a.pub.co.uk/1", "https://news.example.org/x"),
        ("https://b.pub.co.uk/2", "https://www.example.org/y"),
        # intra-domain navigation (subdomain to subdomain)
        ("https://a.pub.co.uk/1", "https://b.pub.co.uk/2"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    out = {
        (r["src_domain"], r["dst_domain"]): r.asDict()
        for r in domain_link_graph(df).collect()
    }
    ext = out[("pub.co.uk", "example.org")]
    assert ext["n_links"] == 2 and ext["intra"] is False
    intra = out[("pub.co.uk", "pub.co.uk")]
    assert intra["n_links"] == 1 and intra["intra"] is True
    assert len(out) == 2


def test_domain_link_graph_single_shuffle(spark):
    from wpextract_spark.operators.anchors import domain_link_graph

    df = spark.createDataFrame(
        [("https://a.x.org/1", "https://b.y.org/2")],
        "src_url string, dst_url string",
    )
    plan = (
        domain_link_graph(df)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert plan.count("Exchange") <= 1  # one hash agg on the domain pair
