"""Driver-contract query registry: every implemented operator exposed as a
(spark_query, oracle_sql) pair over the shared testdata tables.

Conventions (driver compare = row count + schema + order-insensitive value
hash with columns sorted by name):
* every computed column is aliased identically in Spark and SQL;
* floats are rounded to 6 decimals on both sides;
* hashing uses md5-over-UTF-8 (identical in Spark and DuckDB).

Queries marked NO_ORACLE are genuinely non-SQL-expressible (Python kernel
semantics); the driver records a weaker rows-only check for them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as PyWindow
from pyspark.sql import functions as F

from wpextract_spark.operators.dedup import (
    exact_duplicate_groups,
    simhash_near_dup_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from wpextract_spark.operators.extract import content_extract_udf, locale_udf
from wpextract_spark.operators.multimodal import (
    documents_as_media,
    extract_media_features,
    frame_sample_stub,
)
from wpextract_spark.operators.skew import salted_agg, salted_join
from wpextract_spark.operators.similarity import (
    cosine_topk,
    hyperplane,
    embedding_near_dup_pairs,
    ivf_topk,
    lsh_topk,
)
from wpextract_spark.operators.textstats import (
    fingerprints,
    lang_id,
    quality_scores,
    token_stats,
)

# Same explicit whitespace class as operators/dedup.py WS: `\s` diverges
# between Java (includes \x0B) and RE2 (excludes it); this class is
# engine-identical.
WS_SQL = r"[ \t\n\x0B\f\r]+"

# Python's Unicode \s / str.strip() whitespace set spelled as an RE2 class
# (for oracles that restate Python-side squash/strip semantics).
_PY_WS_CLS = (
    r"\t\n\x{0b}\f\r\x{1c}-\x{1f} \x{85}\x{a0}\x{1680}"
    r"\x{2000}-\x{200a}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        # The sandbox testdata is one row group per table, so the scan is a
        # single task; the corpus tables feed CPU-heavy per-row expressions
        # (gram builds, hashing, kernels), which would otherwise run
        # single-threaded — including inside broadcast-build jobs. One cheap
        # shuffle of the small table restores the parallelism a many-file
        # production table gets from the scan itself.
        # 8-way, not defaultParallelism: these tables are a few MB, so fatter
        # tasks beat scheduling 32 tiny ones (straggler variance dominates).
        df = df.repartition(min(8, spark.sparkContext.defaultParallelism))
    return df


# ---------------------------------------------------------------------------
# Extraction-kernel queries (documents table as the corpus)
# ---------------------------------------------------------------------------


def q_extract_text_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate strip invariant: wrapping text in <p> + excluded <table> +
    comment boilerplate and extracting must give back exactly the
    (whitespace-squashed) text. Text is HTML-escaped into the page so
    '&'/'<'/'>' in a corpus can't break the embedding; the parser unescapes,
    the kernel squashes, and the oracle applies the same squash in SQL."""
    docs = _t(spark, sf_dir, "documents")
    escaped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"),
        ">",
        "&gt;",
    )
    html = F.concat(
        F.lit("<html><body><p>"),
        escaped,
        F.lit("</p><table><tr><td>junk</td></tr></table><!-- c --></body></html>"),
    )
    url = F.concat(F.lit("https://example.org/doc-"), F.col("doc_id").cast("string"))
    extracted = content_extract_udf()(html, url)
    return docs.select(F.col("doc_id"), extracted["text"].alias("extracted_text"))


ORACLE_EXTRACT_TEXT = rf"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(regexp_replace(text, '\n{{2,}}', chr(10), 'g'),
                        '(?m)^[{_PY_WS_CLS}]+', '', 'g'),
         '^[{_PY_WS_CLS}]+|[{_PY_WS_CLS}]+$', '', 'g') AS extracted_text
FROM documents
"""


def q_extract_link_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-span extraction with internal/external discrimination and
    relative-href absolutization, on deterministically constructed pages."""
    docs = _t(spark, sf_dir, "documents")
    n_int = (F.col("doc_id") % 3).cast("int")
    # NB: sequence(1, 0) would DESCEND — guard the empty case explicitly.
    internal_links = F.when(n_int < 1, F.lit("")).otherwise(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), n_int),
                lambda i: F.concat(
                    F.lit('<a href="/p/'),
                    (F.col("doc_id") + i).cast("string"),
                    F.lit('">l</a>'),
                ),
            ),
        )
    )
    html = F.concat(
        F.lit("<p>x</p>"),
        internal_links,
        F.lit('<a href="https://other.example.com/e">ext</a>'),
    )
    url = F.concat(F.lit("https://example.org/doc-"), F.col("doc_id").cast("string"), F.lit("/"))
    res = content_extract_udf()(html, url)
    return docs.select(
        "doc_id",
        F.size(res["links_internal"]).alias("n_internal"),
        F.size(res["links_external"]).alias("n_external"),
        # F.get is null-on-out-of-bounds (ANSI-safe), unlike element_at.
        F.get(res["links_internal"], 0)["href"].alias("first_internal_href"),
    )


ORACLE_LINK_SPANS = """
SELECT doc_id,
       CAST(doc_id % 3 AS INT) AS n_internal,
       1 AS n_external,
       CASE WHEN doc_id % 3 > 0
            THEN 'https://example.org/p/' || (doc_id + 1)
            ELSE NULL END AS first_internal_href
FROM documents
"""


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation over the internal-link graph: the classic
    web-scale "anchor file" (per-target link counts + dominant anchor),
    built from REAL kernel link extraction on constructed pages.

    100-TB shape: ``operators/anchors.py`` — two chained hash aggs, the
    first keyed on (target, anchor) so mega-target skew is diluted across
    anchor strings before the target-keyed stage runs.
    """
    from wpextract_spark.operators.anchors import anchor_text_agg

    docs = _t(spark, sf_dir, "documents")
    n_int = (F.col("doc_id") % 3).cast("int")
    links = F.when(n_int < 1, F.lit("")).otherwise(
        F.concat_ws(
            "",
            F.transform(
                F.sequence(F.lit(1), n_int),
                lambda i: F.concat(
                    F.lit('<a href="/p/'),
                    ((F.col("doc_id") + i) % 40).cast("string"),
                    F.lit('">t'),
                    ((F.col("doc_id") + 2 * i) % 5).cast("string"),
                    F.lit("</a>"),
                ),
            ),
        )
    )
    html = F.concat(F.lit("<p>x</p>"), links)
    url = F.concat(F.lit("https://example.org/doc-"), F.col("doc_id").cast("string"), F.lit("/"))
    res = content_extract_udf()(html, url)
    spans = docs.select(F.explode(res["links_internal"]).alias("l")).select(
        F.col("l.href").alias("target"), F.col("l.text").alias("anchor")
    )
    return anchor_text_agg(spans, "target", "anchor")


ORACLE_ANCHOR_TEXTS = """
WITH spans AS (
  SELECT 'https://example.org/p/' || ((doc_id + g.i) % 40) AS target,
         't' || ((doc_id + 2 * g.i) % 5) AS anchor
  FROM documents, LATERAL unnest(generate_series(1, doc_id % 3)) AS g(i)
),
t1 AS (SELECT target, anchor, count(*) AS text_cnt FROM spans GROUP BY 1, 2),
ranked AS (
  SELECT target, anchor, text_cnt,
         row_number() OVER (PARTITION BY target
                            ORDER BY text_cnt DESC, anchor DESC) AS rn,
         CAST(sum(text_cnt) OVER (PARTITION BY target) AS BIGINT) AS n_links,
         count(*) OVER (PARTITION BY target) AS n_texts
  FROM t1)
SELECT target, n_links, n_texts,
       anchor AS top_text, text_cnt AS top_text_cnt
FROM ranked WHERE rn = 1
"""


def q_page_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Head-metadata extraction (title / description / Open Graph /
    canonical / robots / declared lang) via the real DOM kernel on
    constructed pages — the crawl-triage stage that gates retention and
    routes languages before the heavy content kernel runs."""
    from wpextract_spark.operators.extract import page_meta_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    robots = (
        F.when(did % 4 == 0, F.lit('<meta name="robots" content="noindex, follow">'))
        .when(did % 4 == 1, F.lit('<meta name="robots" content="none">'))
        .when(did % 4 == 2, F.lit('<meta name="robots" content="index, NOFOLLOW">'))
        .otherwise(F.lit(""))
    )
    canonical = F.when(
        did % 2 == 0,
        F.concat(
            F.lit('<link rel="canonical" href="https://example.org/c/'),
            did.cast("string"),
            F.lit('/">'),
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html lang="'),
        F.col("lang"),
        F.lit('"><head><title>Doc  '),  # double space: title squash is real
        did.cast("string"),
        F.lit("</title>"),
        F.lit('<meta name="description" content="d'),
        (did % 6).cast("string"),
        F.lit('">'),
        F.lit('<meta property="og:title" content="OG '),
        did.cast("string"),
        F.lit('">'),
        canonical,
        robots,
        F.lit("</head><body><p>x</p></body></html>"),
    )
    meta = page_meta_udf()(html)
    return docs.select(
        "doc_id",
        meta["title"].alias("title"),
        meta["description"].alias("description"),
        meta["og_title"].alias("og_title"),
        meta["canonical"].alias("canonical"),
        meta["robots_noindex"].alias("robots_noindex"),
        meta["robots_nofollow"].alias("robots_nofollow"),
        meta["lang"].alias("decl_lang"),
    )


ORACLE_PAGE_METADATA = """
SELECT doc_id,
       'Doc ' || doc_id AS title,
       'd' || (doc_id % 6) AS description,
       'OG ' || doc_id AS og_title,
       CASE WHEN doc_id % 2 = 0
            THEN 'https://example.org/c/' || doc_id || '/'
            ELSE NULL END AS canonical,
       doc_id % 4 IN (0, 1) AS robots_noindex,
       doc_id % 4 IN (1, 2) AS robots_nofollow,
       lang AS decl_lang
FROM documents
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots.txt retention check: parse each host's robots.txt
    once (Arrow UDF over the 7-row host table, broadcast), evaluate every
    page path JVM-side with longest-match-wins / allow-wins-ties semantics.
    Hosts and paths are constructed so every RFC behavior — wildcard,
    end-anchor, group selection, adjacent agents, empty Disallow, length
    tie — is exercised, and the verdict has a closed form over doc_id."""
    from wpextract_spark.operators.robots import (
        parse_robots_rules_udf,
        robots_allowed,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    host = F.concat(F.lit("h"), (did % 7).cast("string"))
    path = (
        F.when(did % 5 == 0, F.concat(F.lit("/private/doc-"), did.cast("string")))
        .when(did % 5 == 1, F.concat(F.lit("/private/pub/doc-"), did.cast("string")))
        .when(did % 5 == 2, F.concat(F.lit("/doc-"), did.cast("string"), F.lit(".pdf")))
        .when(did % 5 == 3, F.concat(F.lit("/tmp/doc-"), did.cast("string")))
        .otherwise(F.concat(F.lit("/a/doc-"), did.cast("string")))
    )
    pages = docs.select("doc_id", host.alias("host"), path.alias("path"))
    hv = F.col("id")
    robots_txt = (
        F.when(hv == 0, F.lit("User-agent: *\nDisallow: /private/\nAllow: /private/pub/"))
        .when(hv == 1, F.lit("User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*"))
        .when(hv == 2, F.lit("User-agent: *\nDisallow: /"))
        .when(hv == 3, F.lit("# no rules\nSitemap: https://example.org/sitemap.xml"))
        .when(
            hv == 4,
            F.lit(
                "User-agent: specialbot\nDisallow: /special-only\n\n"
                "User-agent: otherbot\nUser-agent: *\nAllow: /a\nDisallow: /"
            ),
        )
        .when(hv == 5, F.lit("User-agent: *\nDisallow:"))
        .otherwise(F.lit("User-agent: *\nAllow: /private/\nDisallow: /private/"))
    )
    robots = spark.range(7).select(
        F.concat(F.lit("h"), hv.cast("string")).alias("host"),
        robots_txt.alias("robots_txt"),
    )
    rules = robots.select(
        "host", parse_robots_rules_udf()(F.col("robots_txt")).alias("rules")
    )
    return pages.join(F.broadcast(rules), "host").select(
        "doc_id",
        "host",
        "path",
        robots_allowed(F.col("rules"), F.col("path")).alias("allowed"),
    )


# Verdict closed form: h2 blocks all; h0 blocks only /private/ (path 0 —
# path 1's longer Allow overrides); h1 blocks the *.pdf$ and /tmp* paths;
# h4's star group is Allow /a + Disallow /, so only path 4 survives; h3
# (no rules), h5 (empty Disallow), h6 (allow wins the length tie) keep all.
ORACLE_ROBOTS_FILTER = """
SELECT doc_id,
       'h' || (doc_id % 7) AS host,
       CASE doc_id % 5
            WHEN 0 THEN '/private/doc-' || doc_id
            WHEN 1 THEN '/private/pub/doc-' || doc_id
            WHEN 2 THEN '/doc-' || doc_id || '.pdf'
            WHEN 3 THEN '/tmp/doc-' || doc_id
            ELSE '/a/doc-' || doc_id END AS path,
       CASE doc_id % 7
            WHEN 2 THEN FALSE
            WHEN 0 THEN doc_id % 5 <> 0
            WHEN 1 THEN doc_id % 5 NOT IN (2, 3)
            WHEN 4 THEN doc_id % 5 = 4
            ELSE TRUE END AS allowed
FROM documents
"""


def q_redirect_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer doubling: descending chains
    (c<did> -> c<did-1>, terminal at multiples of 10, so hops = did % 10)
    plus 4-cycles in a disjoint namespace (y<4k..4k+3>), which must come
    back unresolved. The oracle walks the same edge table independently
    with a recursive CTE — construction shared, resolution independent."""
    from wpextract_spark.operators.redirects import resolve_redirects

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    chain = docs.where(did % 10 != 0).select(
        F.concat(F.lit("c"), did.cast("string")).alias("src"),
        F.concat(F.lit("c"), (did - 1).cast("string")).alias("dst"),
    )
    cycle = docs.select(
        F.concat(F.lit("y"), did.cast("string")).alias("src"),
        F.concat(F.lit("y"), (did - did % 4 + (did + 1) % 4).cast("string")).alias(
            "dst"
        ),
    )
    return resolve_redirects(chain.unionAll(cycle))


ORACLE_REDIRECT_CHAINS = """
WITH RECURSIVE edges AS (
  SELECT 'c' || doc_id AS src, 'c' || (doc_id - 1) AS dst
  FROM documents WHERE doc_id % 10 <> 0
  UNION ALL
  SELECT 'y' || doc_id, 'y' || (doc_id - doc_id % 4 + (doc_id + 1) % 4)
  FROM documents
),
walk AS (
  SELECT src, dst AS cur, 1 AS hops FROM edges
  UNION ALL
  SELECT w.src, e.dst, w.hops + 1
  FROM walk w JOIN edges e ON w.cur = e.src
  WHERE w.hops < 64
),
last AS (
  SELECT src, cur, hops,
         row_number() OVER (PARTITION BY src ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT l.src,
       CASE WHEN t.src IS NULL THEN l.cur END AS final_url,
       CASE WHEN t.src IS NULL THEN l.hops END AS hops,
       t.src IS NULL AS resolved
FROM last l LEFT JOIN (SELECT DISTINCT src FROM edges) t ON l.cur = t.src
WHERE l.rn = 1
"""


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization: NFC + typographic-punctuation fold +
    zero-width/control strip + horizontal-whitespace collapse over text
    decorated with every dirty-web-text species (curly quotes, combining
    accents, NBSP, BEL, ZWSP, CRLF, VT). The oracle is an independent
    DuckDB reimplementation (nfc_normalize/translate/regexp chains), not a
    restated construction."""
    from wpextract_spark.operators.textnorm import normalize_text_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    deco = (
        F.when(did % 6 == 0, F.lit("“Quo’s” – café — A B"))
        .when(did % 6 == 1, F.lit("xy​ z\t\tw"))
        .when(did % 6 == 2, F.lit("wait… café ‘q’"))  # decomposed e+U+0301
        .when(did % 6 == 3, F.lit("  lead  trail  "))
        .when(did % 6 == 4, F.lit("line1\r\n  line23"))
        .otherwise(F.lit("plain"))
    )
    dirty = F.concat(F.col("text"), F.lit(" "), deco)
    return docs.select("doc_id", normalize_text_udf()(dirty).alias("clean"))


ORACLE_NORMALIZE_TEXT = """
WITH dirty AS (
  SELECT doc_id,
         text || ' ' || CASE doc_id % 6
           WHEN 0 THEN '“Quo’s” – café — A B'
           WHEN 1 THEN 'x' || chr(7) || 'y​ z' || chr(9) || chr(9) || 'w'
           WHEN 2 THEN 'wait… cafe' || chr(769) || ' ‘q’'
           WHEN 3 THEN '  lead  trail  '
           WHEN 4 THEN 'line1' || chr(13) || chr(10) || '  line2' || chr(11) || '3'
           ELSE 'plain' END AS s
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(
         regexp_replace(
           translate(replace(nfc_normalize(s), '…', '...'),
                     ' ‘’“”–—​‌‍﻿',
                     ' ''''""--'),
           '[\\x00-\\x08\\x0e-\\x1f\\x7f]', '', 'g'),
         '[ \\t\\r\\f\\v]+', ' ', 'g')) AS clean
FROM dirty
"""


def q_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style dedup keys: two surface variants per document — one
    accented/lowercase, one shouting with extra punctuation and an NBSP —
    must collapse to ONE key per document (case/accent/punct/digit
    invariance), then a JVM groupBy turns keys into dedup verdicts. The
    oracle rebuilds the key with strip_accents/lower/regexp chains."""
    from wpextract_spark.operators.textnorm import dedup_key_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    v0 = docs.select(
        (did * 2).alias("vid"),
        F.concat(F.lit("élève: "), F.col("text")).alias("s"),
    )
    v1 = docs.select(
        (did * 2 + 1).alias("vid"),
        F.concat(
            F.lit("ELEVE "), F.upper(F.col("text")), F.lit(" !! ")
        ).alias("s"),
    )
    keyed = v0.unionAll(v1).select(
        "vid", dedup_key_udf()(F.col("s")).alias("dkey")
    )
    return keyed.groupBy("dkey").agg(
        F.count("*").alias("n_docs"), F.min("vid").alias("keep_id")
    )


ORACLE_DEDUP_KEYS = """
WITH variants AS (
  SELECT doc_id * 2 AS vid, 'élève: ' || text AS s FROM documents
  UNION ALL
  SELECT doc_id * 2 + 1, 'ELEVE ' || upper(text) || ' !! ' FROM documents
),
keyed AS (
  SELECT vid,
         trim(regexp_replace(regexp_replace(regexp_replace(
           lower(strip_accents(s)),
           '[0-9]', '0', 'g'),
           '[^a-z0 \\t\\n\\r\\f\\v]', '', 'g'),
           '[ \\t\\n\\r\\f\\v]+', ' ', 'g')) AS dkey
  FROM variants)
SELECT dkey, count(*) AS n_docs, min(vid) AS keep_id
FROM keyed GROUP BY dkey
"""


def q_fix_mojibake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding repair: UTF-8-decoded-as-cp1252 mojibake unwound (single and
    double), with the two conservative negative controls — clean accented
    text never touched, and a stray € (invalid as a UTF-8 continuation
    start) aborting the whole-string repair. Oracle restates the known
    repaired forms of the constructed corruption."""
    from wpextract_spark.operators.encoding import fix_mojibake_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    deco = (
        F.when(did % 6 == 0, F.lit("cafÃ© crawl"))
        .when(did % 6 == 1, F.lit("ÃƒÂ© twice"))
        .when(did % 6 == 2, F.lit("déjà vu"))
        .when(did % 6 == 3, F.lit("dealâ€”done"))
        .when(did % 6 == 4, F.lit("€99 caffÃ¨"))
        .otherwise(F.lit("plain ascii"))
    )
    dirty = F.concat(F.col("text"), F.lit(" "), deco)
    res = fix_mojibake_udf()(dirty)
    return docs.select(
        "doc_id",
        res["fixed"].alias("fixed"),
        res["changed"].alias("changed"),
    )


ORACLE_FIX_MOJIBAKE = """
SELECT doc_id,
       text || ' ' || CASE doc_id % 6
         WHEN 0 THEN 'café crawl'
         WHEN 1 THEN 'é twice'
         WHEN 2 THEN 'déjà vu'
         WHEN 3 THEN 'deal—done'
         WHEN 4 THEN '€99 caffÃ¨'
         ELSE 'plain ascii' END AS fixed,
       doc_id % 6 IN (0, 1, 3) AS changed
FROM documents
"""


def q_render_markdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structure-preserving HTML→Markdown over the real DOM kernel:
    headings, lists with inline emphasis, blockquotes, fenced code + hr,
    pipe tables and links — one construction variant per feature family,
    markdown restated closed-form in the oracle."""
    from wpextract_spark.operators.extract import markdown_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    html = (
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit("<h2>Doc "), ds, F.lit("</h2><p>"),
                F.col("text"), F.lit("</p>"),
            ),
        )
        .when(
            did % 5 == 1,
            F.concat(
                F.lit("<ul><li>item "), ds,
                F.lit("</li><li>has <strong>bold</strong></li></ul>"),
            ),
        )
        .when(
            did % 5 == 2,
            F.concat(
                F.lit("<blockquote><p>"), F.col("text"),
                F.lit("</p></blockquote>"),
            ),
        )
        .when(
            did % 5 == 3,
            F.concat(F.lit("<pre>x = "), ds, F.lit("</pre><hr><p>done</p>")),
        )
        .otherwise(
            F.concat(
                F.lit("<table><tr><th>k</th><th>v</th></tr><tr><td>id</td><td>"),
                ds,
                F.lit('</td></tr></table><p>See <a href="/p/'),
                ds, F.lit('">post '), ds, F.lit("</a>.</p>"),
            )
        )
    )
    return docs.select("doc_id", markdown_udf()(html).alias("markdown"))


ORACLE_RENDER_MARKDOWN = """
SELECT doc_id,
  CASE doc_id % 5
    WHEN 0 THEN '## Doc ' || doc_id || chr(10) || chr(10) || text
    WHEN 1 THEN '- item ' || doc_id || chr(10) || '- has **bold**'
    WHEN 2 THEN '> ' || text
    WHEN 3 THEN '```' || chr(10) || 'x = ' || doc_id || chr(10) || '```'
                || chr(10) || chr(10) || '---' || chr(10) || chr(10) || 'done'
    ELSE '| k | v |' || chr(10) || '| --- | --- |' || chr(10)
         || '| id | ' || doc_id || ' |' || chr(10) || chr(10)
         || 'See [post ' || doc_id || '](/p/' || doc_id || ').'
  END AS markdown
FROM documents
"""


def q_site_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-scoped template removal: nav + footer lines stamped on every
    page of a host get stripped; a promo line on only half the host's pages
    (below the 0.6 document-frequency threshold) survives. The oracle
    recomputes per-host line document frequencies independently."""
    from wpextract_spark.operators.boilerplate import strip_site_boilerplate

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    hk = (did % 5).cast("string")
    page_text = F.concat(
        F.lit("NAV h"), hk, F.lit(" | home | about\n"),
        F.when(did % 2 == 0, F.lit("PROMO banner\n")).otherwise(F.lit("")),
        F.col("text"),
        F.lit("\ncopyright h"), hk, F.lit(" footer"),
    )
    pages = docs.select(
        "doc_id",
        F.concat(F.lit("h"), hk).alias("host"),
        page_text.alias("text"),
    )
    return strip_site_boilerplate(pages)


ORACLE_SITE_BOILERPLATE = """
WITH pages AS (
  SELECT doc_id, 'h' || (doc_id % 5) AS host,
         'NAV h' || (doc_id % 5) || ' | home | about' || chr(10) ||
         CASE WHEN doc_id % 2 = 0 THEN 'PROMO banner' || chr(10) ELSE '' END ||
         text || chr(10) ||
         'copyright h' || (doc_id % 5) || ' footer' AS text
  FROM documents),
split AS (
  SELECT doc_id, host, string_split(text, chr(10)) AS parts FROM pages),
lines AS (
  SELECT doc_id, host, g.i - 1 AS pos, parts[g.i] AS line,
         lower(trim(parts[g.i])) AS norm
  FROM split, LATERAL unnest(generate_series(1, len(parts))) AS g(i)),
hp AS (SELECT host, count(*) AS n_pages FROM pages GROUP BY host),
ldf AS (SELECT host, norm, count(DISTINCT doc_id) AS df
        FROM lines WHERE norm <> '' GROUP BY host, norm),
bl AS (SELECT ldf.host, norm FROM ldf JOIN hp USING (host)
       WHERE n_pages >= 2 AND df >= n_pages * 0.6),
kept AS (SELECT l.* FROM lines l
         LEFT JOIN bl ON l.host = bl.host AND l.norm = bl.norm
         WHERE bl.norm IS NULL),
agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id)
SELECT p.doc_id,
       coalesce(a.text_clean, '') AS text_clean,
       len(string_split(p.text, chr(10))) AS n_lines,
       coalesce(a.n_kept, 0) AS n_kept
FROM pages p LEFT JOIN agg a USING (doc_id)
"""


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl scheduling: change-rate estimation over a 6-run crawl
    history with four archetypes — static page, every-run churner, one
    mid-history change, and a single-observation newcomer — bucketed into
    schedule tiers. Oracle recomputes the lag-based change flags
    independently."""
    from wpextract_spark.operators.recrawl import change_rates

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    runs = F.when(did % 4 == 3, F.sequence(F.lit(0), F.lit(0))).otherwise(
        F.sequence(F.lit(0), F.lit(5))
    )
    hist = docs.select(
        F.concat(F.lit("u"), did.cast("string")).alias("url"),
        did.alias("did"),
        F.explode(runs).alias("run_id"),
    ).select(
        "url",
        "run_id",
        F.when(F.col("did") % 4 == 0, F.lit("A"))
        .when(
            F.col("did") % 4 == 1,
            F.concat(F.lit("r"), F.col("run_id").cast("string")),
        )
        .otherwise(
            F.concat(
                F.lit("b"), F.floor(F.col("run_id") / 3).cast("string")
            )
        )
        .alias("fp"),
    )
    return change_rates(hist)


ORACLE_RECRAWL_PRIORITY = """
WITH hist AS (
  SELECT 'u' || doc_id AS url, g.run AS run_id,
         CASE doc_id % 4
           WHEN 0 THEN 'A'
           WHEN 1 THEN 'r' || g.run
           ELSE 'b' || (g.run // 3) END AS fp
  FROM documents,
       LATERAL unnest(generate_series(0,
         CASE WHEN doc_id % 4 = 3 THEN 0 ELSE 5 END)) AS g(run)),
obs AS (
  SELECT url, run_id,
         CASE WHEN lag(fp) OVER w IS NULL THEN NULL
              WHEN fp <> lag(fp) OVER w THEN 1 ELSE 0 END AS changed
  FROM hist WINDOW w AS (PARTITION BY url ORDER BY run_id)),
agg AS (
  SELECT url, count(*) AS n_runs,
         CAST(coalesce(sum(changed), 0) AS BIGINT) AS n_changes,
         arg_max(changed, run_id) = 1 AS lc
  FROM obs GROUP BY url)
SELECT url, n_runs, n_changes,
       CASE WHEN n_runs > 1
            THEN round(n_changes * 1.0 / (n_runs - 1), 6) END AS change_rate,
       CASE WHEN n_runs > 1 THEN lc END AS last_changed,
       CASE WHEN n_runs <= 1 THEN 'new'
            WHEN n_changes * 1.0 / (n_runs - 1) >= 0.5 THEN 'hot'
            WHEN n_changes * 1.0 / (n_runs - 1) >= 0.1 THEN 'warm'
            WHEN n_changes > 0 THEN 'cool'
            ELSE 'static' END AS tier
FROM agg
"""


def q_incremental_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental recrawl update end-to-end: previous corpus extracted
    from run 1 (real kernel), run 2 removes every 10th page, changes every
    10th+1, adds a new namespace for every 10th+2 — the plan re-extracts
    only the stale subset and carries the rest. Oracle restates the final
    corpus (urls, md5 page fingerprints, texts) closed-form."""
    from wpextract_spark.plans.incremental import (
        extract_pages,
        incremental_update,
    )

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    url1 = F.concat(F.lit("u"), ds)
    run1 = docs.select(
        url1.alias("url"),
        F.concat(F.lit("<p>old "), ds, F.lit("</p>")).alias("html"),
    )
    kept = docs.where(did % 10 != 0).select(
        url1.alias("url"),
        F.when(
            did % 10 == 1, F.concat(F.lit("<p>new "), ds, F.lit("</p>"))
        )
        .otherwise(F.concat(F.lit("<p>old "), ds, F.lit("</p>")))
        .alias("html"),
    )
    added = docs.where(did % 10 == 2).select(
        F.concat(F.lit("a"), ds).alias("url"),
        F.concat(F.lit("<p>add "), ds, F.lit("</p>")).alias("html"),
    )
    run2 = kept.unionByName(added)
    corpus, _diff = incremental_update(extract_pages(run1), run2)
    return corpus


ORACLE_INCREMENTAL_EXTRACT = """
SELECT 'u' || doc_id AS url,
       md5('<p>' || CASE WHEN doc_id % 10 = 1 THEN 'new' ELSE 'old' END
           || ' ' || doc_id || '</p>') AS page_fp,
       CASE WHEN doc_id % 10 = 1 THEN 'new' ELSE 'old' END
           || ' ' || doc_id AS text
FROM documents WHERE doc_id % 10 <> 0
UNION ALL
SELECT 'a' || doc_id,
       md5('<p>add ' || doc_id || '</p>'),
       'add ' || doc_id
FROM documents WHERE doc_id % 10 = 2
"""


def q_robots_directives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-rule robots.txt directives for the crawl scheduler: sitemap
    discovery seeds (file-global) and the group-scoped crawl-delay, with a
    malformed delay ignored and group selection honored."""
    from wpextract_spark.operators.robots import robots_directives_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    txt = (
        F.when(
            did % 4 == 0,
            F.lit(
                "User-agent: *\nCrawl-delay: 1.5\nDisallow: /x\n"
                "Sitemap: https://h0/s1.xml\nSitemap: https://h0/s2.xml"
            ),
        )
        .when(
            did % 4 == 1,
            F.lit(
                "User-agent: special\nCrawl-delay: 9\n\n"
                "User-agent: *\nDisallow: /y"
            ),
        )
        .when(
            did % 4 == 2,
            F.lit(
                "Sitemap: https://h2/map.xml\n"
                "User-agent: *\nCrawl-delay: fast"
            ),
        )
        .otherwise(F.lit(""))
    )
    res = robots_directives_udf()(txt)
    return docs.select(
        "doc_id",
        res["sitemaps"].alias("sitemaps"),
        res["n_sitemaps"].alias("n_sitemaps"),
        res["crawl_delay"].alias("crawl_delay"),
    )


ORACLE_ROBOTS_DIRECTIVES = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'https://h0/s1.xml,https://h0/s2.xml'
         WHEN 2 THEN 'https://h2/map.xml' END AS sitemaps,
       CASE doc_id % 4 WHEN 0 THEN 2 WHEN 2 THEN 1 ELSE 0 END AS n_sitemaps,
       CASE doc_id % 4 WHEN 0 THEN CAST(1.5 AS DOUBLE) END AS crawl_delay
FROM documents
"""


def q_compression_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal: zlib ratio over document text with a
    repetitive decoration on every 3rd doc (which must compress visibly
    harder). zlib is not SQL-expressible, so the oracle is
    construction-derived (_oracle_compression_signal): expected
    (raw_len, zlib_len, ratio) computed per doc_id with stdlib zlib over
    the deterministic sf0.01 corpus at registry-build time, emitted as a
    literal VALUES table — the same pattern as the extraction goldens.
    Value semantics are additionally pinned by tests/test_textstats.py on
    known-entropy corpora."""
    from wpextract_spark.operators.textstats import compression_signal_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    # every 3rd doc gets highly repetitive padding: its ratio must drop.
    padded = F.when(
        did % 3 == 0, F.concat(F.col("text"), F.repeat(F.lit(" spam"), 40))
    ).otherwise(F.col("text"))
    res = compression_signal_udf()(padded)
    return docs.select(
        "doc_id",
        res["raw_len"].alias("raw_len"),
        res["zlib_len"].alias("zlib_len"),
        res["ratio"].alias("ratio"),
    )


def _oracle_compression_signal(
    sf_dir: str = "/root/testdata/sf0.01",
) -> str:
    """zlib is deterministic but not SQL-expressible, so the oracle is a
    construction-derived golden: re-apply q_compression_signal's exact
    padding rule to the deterministic sf0.01 corpus (the driver's
    correctness scale) and compute (raw_len, zlib_len, ratio) with stdlib
    zlib at registry-build time. Ratio literals carry full repr precision
    so the double round-trips exactly through DuckDB."""
    import zlib as _zlib

    import duckdb as _duckdb

    try:
        rows = _duckdb.connect().execute(
            "SELECT doc_id, text FROM read_parquet("
            f"'{sf_dir}/documents.parquet') ORDER BY doc_id"
        ).fetchall()
    except Exception:  # pragma: no cover - corpus missing in exotic envs
        return None
    vals = []
    for did, text in rows:
        padded = text + " spam" * 40 if did % 3 == 0 else text
        raw = padded.encode("utf-8") if padded is not None else b""
        comp = len(_zlib.compress(raw, 6))
        if padded is None:
            vals.append(f"({did}, NULL, NULL, NULL)")
        elif not raw:
            vals.append(f"({did}, 0, {comp}, NULL)")
        else:
            vals.append(
                f"({did}, {len(raw)}, {comp}, {comp / len(raw)!r})"
            )
    values = ",\n".join(vals)
    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(raw_len AS BIGINT) AS raw_len,
       CAST(zlib_len AS BIGINT) AS zlib_len,
       CAST(ratio AS DOUBLE) AS ratio
FROM (VALUES
{values}
) AS t(doc_id, raw_len, zlib_len, ratio)
"""


def q_jsonld_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """schema.org JSON-LD extraction: Yoast-style @graph envelope, simple
    object with a bare-string author, a malformed block next to a valid
    one (per-block skip), and a page with no JSON-LD at all."""
    from wpextract_spark.operators.extract import jsonld_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    open_tag = '<script type="application/ld+json">'
    block = (
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(
                    open_tag
                    + '{"@context":"https://schema.org","@graph":['
                    + '{"@type":"WebSite","name":"S"},'
                    + '{"@type":"Article","headline":"Post '
                ),
                ds,
                F.lit('","datePublished":"2024-01-02","author":'),
                F.lit('{"@type":"Person","name":"Author '),
                ds,
                F.lit('"}}]}</script>'),
            ),
        )
        .when(
            did % 4 == 1,
            F.concat(
                F.lit(open_tag + '{"@type":"NewsArticle","headline":"News '),
                ds,
                F.lit('","author":"Jane"}</script>'),
            ),
        )
        .when(
            did % 4 == 2,
            F.lit(
                open_tag + "{oops</script>"
                + open_tag + '[{"@type":"BreadcrumbList"}]</script>'
            ),
        )
        .otherwise(F.lit("<script>var x=1;</script>"))
    )
    html = F.concat(
        F.lit("<html><head>"), block, F.lit("</head><body><p>x</p></body></html>")
    )
    res = jsonld_udf()(html)
    return docs.select(
        "doc_id",
        res["types"].alias("types"),
        res["n_objects"].alias("n_objects"),
        res["headline"].alias("headline"),
        res["date_published"].alias("date_published"),
        res["author"].alias("author"),
    )


ORACLE_JSONLD_EXTRACT = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'WebSite,Article'
         WHEN 1 THEN 'NewsArticle'
         WHEN 2 THEN 'BreadcrumbList' END AS types,
       CASE doc_id % 4 WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN 1
                       ELSE 0 END AS n_objects,
       CASE doc_id % 4
         WHEN 0 THEN 'Post ' || doc_id
         WHEN 1 THEN 'News ' || doc_id END AS headline,
       CASE doc_id % 4 WHEN 0 THEN '2024-01-02' END AS date_published,
       CASE doc_id % 4
         WHEN 0 THEN 'Author ' || doc_id
         WHEN 1 THEN 'Jane' END AS author
FROM documents
"""


def q_hreflang_alternates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hreflang alternate discovery (the generic-web translation channel):
    heads carry 3 / 1 / 0 rel=alternate links per variant, mixed-case
    hreflang lowered, bare hreflang without href dropped, non-hreflang
    alternates (RSS) ignored. Exploded to one row per alternate."""
    from wpextract_spark.operators.extract import alternates_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    links = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<link rel="alternate" hreflang="EN-us" href="https://e/en/doc-'),
                ds,
                F.lit('"><link rel="alternate" hreflang="de" href="https://e/de/doc-'),
                ds,
                F.lit('"><link rel="alternate" hreflang="x-default" href="https://e/doc-'),
                ds,
                F.lit('">'),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit('<link rel="alternate" hreflang="fr" href="https://e/fr/doc-'),
                ds,
                F.lit('"><link rel="alternate" hreflang="es">'),
            ),
        )
        .otherwise(
            F.lit('<link rel="alternate" type="application/rss+xml" href="https://e/feed">')
        )
    )
    html = F.concat(F.lit("<html><head>"), links, F.lit("</head><body></body></html>"))
    return docs.select(
        "doc_id", F.explode(alternates_udf()(html)).alias("alt")
    ).select(
        "doc_id",
        F.col("alt")["hreflang"].alias("hreflang"),
        F.col("alt")["href"].alias("href"),
    )


ORACLE_HREFLANG_ALTERNATES = """
SELECT doc_id, 'en-us' AS hreflang,
       'https://e/en/doc-' || doc_id AS href
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'de', 'https://e/de/doc-' || doc_id
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'x-default', 'https://e/doc-' || doc_id
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'fr', 'https://e/fr/doc-' || doc_id
FROM documents WHERE doc_id % 3 = 1
"""


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-protocol parsing: a urlset with full and minimal entries
    (unparseable priority -> null, loc-less entry dropped), a sitemapindex
    child, and a non-sitemap payload contributing nothing."""
    from wpextract_spark.operators.sitemap import sitemap_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    xml = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(
                    "<urlset><url><loc>https://e/p-"
                ),
                ds,
                F.lit(
                    "?a=1&amp;b=2</loc><lastmod>2024-03-01</lastmod>"
                    "<changefreq>daily</changefreq><priority>0.8</priority>"
                    "</url><url><loc>https://e/q-"
                ),
                ds,
                F.lit(
                    "</loc><priority>oops</priority></url>"
                    "<url><lastmod>2024-01-01</lastmod></url></urlset>"
                ),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("<sitemapindex><sitemap><loc>https://e/s-"),
                ds,
                F.lit(
                    ".xml</loc><lastmod>2024-02-02</lastmod></sitemap>"
                    "</sitemapindex>"
                ),
            ),
        )
        .otherwise(F.lit("plain text, no sitemap here"))
    )
    res = sitemap_udf()(xml)
    return docs.select(
        "doc_id", res["kind"].alias("kind"), F.explode(res["entries"]).alias("e")
    ).select(
        "doc_id",
        "kind",
        F.col("e")["loc"].alias("loc"),
        F.col("e")["lastmod"].alias("lastmod"),
        F.col("e")["changefreq"].alias("changefreq"),
        F.col("e")["priority"].alias("priority"),
    )


ORACLE_SITEMAP_PARSE = """
SELECT doc_id, 'urlset' AS kind,
       'https://e/p-' || doc_id || '?a=1&b=2' AS loc,
       '2024-03-01' AS lastmod, 'daily' AS changefreq,
       CAST(0.8 AS DOUBLE) AS priority
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'urlset', 'https://e/q-' || doc_id, NULL, NULL, NULL
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'index', 'https://e/s-' || doc_id || '.xml',
       '2024-02-02', NULL, NULL
FROM documents WHERE doc_id % 3 = 1
"""


def q_frontier_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-frontier prioritization composing the crawl-ops signals:
    change tiers (one variant absent -> 'new' default), per-host politeness
    delays (broadcast; two throttled hosts), and sitemap freshness (true /
    false / unknown). Oracle restates the score arithmetic closed-form."""
    from wpextract_spark.operators.frontier import frontier_priority

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    urls = docs.select(
        F.concat(F.lit("u"), ds).alias("url"),
        F.concat(F.lit("h"), (did % 5).cast("string")).alias("host"),
    )
    schedule = docs.where(did % 4 != 3).select(
        F.concat(F.lit("u"), ds).alias("url"),
        F.when(did % 4 == 0, F.lit("hot"))
        .when(did % 4 == 1, F.lit("warm"))
        .otherwise(F.lit("static"))
        .alias("tier"),
    )
    politeness = spark.range(2).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("host"),
        F.when(F.col("id") == 0, F.lit(1.0)).otherwise(F.lit(9.0)).alias(
            "crawl_delay"
        ),
    )
    freshness = docs.where(did % 3 != 2).select(
        F.concat(F.lit("u"), ds).alias("url"),
        (did % 3 == 0).alias("recently_modified"),
    )
    return frontier_priority(urls, schedule, politeness, freshness)


ORACLE_FRONTIER_PRIORITY = """
SELECT 'u' || doc_id AS url,
       'h' || (doc_id % 5) AS host,
       CASE doc_id % 4 WHEN 0 THEN 'hot' WHEN 1 THEN 'warm'
                       WHEN 2 THEN 'static' ELSE 'new' END AS tier,
       round(
         CASE doc_id % 4 WHEN 0 THEN 1.0 WHEN 1 THEN 0.5
                         WHEN 2 THEN 0.05 ELSE 0.8 END
         * CASE doc_id % 5 WHEN 0 THEN 1.0 / 2.0
                           WHEN 1 THEN 1.0 / 10.0 ELSE 1.0 END
         + CASE WHEN doc_id % 3 = 0 THEN 0.5 ELSE 0.0 END,
       6) AS priority
FROM documents
"""


def q_publish_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-date cascade: jsonld > og-article meta > <time> > URL
    pattern, with an invalid stronger signal (unparseable jsonld date)
    falling through to the URL, and a no-signal page yielding nulls."""
    from wpextract_spark.operators.dates import publish_dates

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    ld = '<script type="application/ld+json">'
    html = (
        F.when(
            did % 6 == 0,
            F.lit(
                ld + '{"@type":"Article","datePublished":"2024-01-02T10:00:00Z"}'
                '</script><meta property="article:published_time" '
                'content="2023-12-31T23:59:59Z">'
            ),
        )
        .when(
            did % 6 == 1,
            F.lit(
                '<meta property="article:published_time" '
                'content="2023-12-31T23:59:59Z">'
            ),
        )
        .when(did % 6 == 2, F.lit('<time datetime="2022-05-05">May 5</time>'))
        .when(did % 6 == 3, F.lit("<p>no in-page signal</p>"))
        .when(
            did % 6 == 4,
            F.lit(ld + '{"@type":"Article","datePublished":"not-a-date"}</script>'),
        )
        .otherwise(F.lit("<p>nothing at all</p>"))
    )
    url = F.when(
        (did % 6).isin(3, 4),
        F.concat(F.lit("https://e/2021/07/15/post-"), ds),
    ).otherwise(F.concat(F.lit("https://e/post-"), ds))
    pages = docs.select("doc_id", html.alias("html"), url.alias("url"))
    return publish_dates(pages)


ORACLE_PUBLISH_DATES = """
SELECT doc_id,
       CASE doc_id % 6
         WHEN 0 THEN DATE '2024-01-02'
         WHEN 1 THEN DATE '2023-12-31'
         WHEN 2 THEN DATE '2022-05-05'
         WHEN 3 THEN DATE '2021-07-15'
         WHEN 4 THEN DATE '2021-07-15' END AS publish_date,
       CASE doc_id % 6
         WHEN 0 THEN 'jsonld' WHEN 1 THEN 'meta' WHEN 2 THEN 'time'
         WHEN 3 THEN 'url' WHEN 4 THEN 'url' END AS date_source
FROM documents
"""


def q_classify_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-granularity snapshot classification: template churn (raw bytes
    differ, extracted text identical) separated from real content changes,
    plus the added/removed/unchanged statuses — one construction variant
    per outcome."""
    from wpextract_spark.operators.snapshot import classify_changes

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    url = F.concat(F.lit("u"), ds)
    old_html = F.concat(F.lit("<div>sb-old</div><p>t"), ds, F.lit("</p>"))
    old_text = F.concat(F.lit("t"), ds)
    new_html = (
        F.when(did % 5 == 2, F.concat(F.lit("<div>sb-NEW</div><p>t"), ds, F.lit("</p>")))
        .when(did % 5 == 3, F.concat(F.lit("<p>rewritten "), ds, F.lit("</p>")))
        .otherwise(old_html)
    )
    new_text = F.when(did % 5 == 3, F.concat(F.lit("rewritten "), ds)).otherwise(
        old_text
    )
    old = docs.where(did % 5 != 4).select(
        url.alias("url"), old_html.alias("html"), old_text.alias("text")
    )
    new = docs.where(did % 5 != 0).select(
        url.alias("url"), new_html.alias("html"), new_text.alias("text")
    )
    return classify_changes(old, new)


ORACLE_CLASSIFY_CHANGES = """
SELECT 'u' || doc_id AS url,
       CASE doc_id % 5
         WHEN 0 THEN 'removed'
         WHEN 1 THEN 'unchanged'
         WHEN 2 THEN 'template_change'
         WHEN 3 THEN 'content_change'
         ELSE 'added' END AS status
FROM documents
"""


def q_containment_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed containment detection: each document paired with a 6-word
    quote of itself — containment(quote→full) = 1.0 while symmetric
    Jaccard stays tiny. Oracle recomputes gram sets, pair intersections
    and both containment directions independently in SQL."""
    from wpextract_spark.operators.dedup import containment_pairs

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    words = F.split(F.col("text"), " ")
    full = docs.select(
        F.concat(F.lit("f"), ds).alias("doc_id"), F.col("text").alias("text")
    )
    quote = docs.select(
        F.concat(F.lit("q"), ds).alias("doc_id"),
        F.array_join(F.slice(words, 1, 6), " ").alias("text"),
    )
    return containment_pairs(full.unionAll(quote), threshold=0.9)


ORACLE_CONTAINMENT_DUPS = """
WITH base AS (
  SELECT 'f' || doc_id AS id, text FROM documents
  UNION ALL
  SELECT 'q' || doc_id, array_to_string(string_split(text, ' ')[1:6], ' ')
  FROM documents
),
w AS (SELECT id, string_split(text, ' ') AS ws FROM base),
g0 AS (
  SELECT id, array_to_string(ws[g.i + 1 : g.i + 3], ' ') AS gram
  FROM w, LATERAL unnest(generate_series(0, len(ws) - 3)) AS g(i)
  WHERE len(ws) >= 3),
g AS (SELECT DISTINCT id, gram FROM g0),
sizes AS (SELECT id, count(*) AS n FROM g GROUP BY id),
pairs AS (
  SELECT l.id AS id_a, r.id AS id_b, count(*) AS common
  FROM g l JOIN g r ON l.gram = r.gram AND l.id < r.id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(common * 1.0 / sa.n, 6) AS cont_a_in_b,
       round(common * 1.0 / sb.n, 6) AS cont_b_in_a
FROM pairs
JOIN sizes sa ON pairs.id_a = sa.id
JOIN sizes sb ON pairs.id_b = sb.id
WHERE greatest(round(common * 1.0 / sa.n, 6),
               round(common * 1.0 / sb.n, 6)) >= 0.9
"""


def q_feed_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSS/Atom feed parsing: an RSS channel with a CDATA title and a
    keyless (dropped) item, an Atom feed preferring the rel=alternate
    link over rel=self, and a non-feed payload contributing nothing."""
    from wpextract_spark.operators.sitemap import feed_udf

    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    ds = did.cast("string")
    xml = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit("<rss><channel><title>Blog "),
                ds,
                F.lit(
                    "</title><item><title><![CDATA[Post & "
                ),
                ds,
                F.lit(
                    "]]></title><link>https://e/p-"
                ),
                ds,
                F.lit(
                    "</link><pubDate>Mon, 01 Jan 2024 10:00:00 +0000</pubDate>"
                    "<guid>g-"
                ),
                ds,
                F.lit(
                    "</guid></item><item><title>keyless</title></item>"
                    "</channel></rss>"
                ),
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("<feed><title>Atom "),
                ds,
                F.lit(
                    '</title><entry><title>E</title>'
                    '<link rel="self" href="https://e/self"/>'
                    '<link rel="alternate" href="https://e/a-'
                ),
                ds,
                F.lit(
                    '"/><id>tag:e-'
                ),
                ds,
                F.lit(
                    "</id><updated>2024-02-02T00:00:00Z</updated></entry></feed>"
                ),
            ),
        )
        .otherwise(F.lit("<html><body>404 not a feed</body></html>"))
    )
    res = feed_udf()(xml)
    return docs.select(
        "doc_id",
        res["kind"].alias("kind"),
        res["title"].alias("feed_title"),
        F.explode(res["entries"]).alias("e"),
    ).select(
        "doc_id",
        "kind",
        "feed_title",
        F.col("e")["title"].alias("title"),
        F.col("e")["link"].alias("link"),
        F.col("e")["published"].alias("published"),
        F.col("e")["guid"].alias("guid"),
    )


ORACLE_FEED_PARSE = """
SELECT doc_id, 'rss' AS kind, 'Blog ' || doc_id AS feed_title,
       'Post & ' || doc_id AS title,
       'https://e/p-' || doc_id AS link,
       'Mon, 01 Jan 2024 10:00:00 +0000' AS published,
       'g-' || doc_id AS guid
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT doc_id, 'atom', 'Atom ' || doc_id, 'E',
       'https://e/a-' || doc_id, '2024-02-02T00:00:00Z', 'tag:e-' || doc_id
FROM documents WHERE doc_id % 3 = 1
"""


def q_extract_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-locale sniffing with the excluded-segment and normalization rules."""
    docs = _t(spark, sf_dir, "documents")
    seg = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("tag"))
        .when(F.col("doc_id") % 5 == 0, F.lit("news"))
        .otherwise(F.col("lang"))
    )
    url = F.concat(
        F.lit("https://example.org/"), seg, F.lit("/doc-"),
        F.col("doc_id").cast("string"), F.lit("/"),
    )
    return docs.select("doc_id", locale_udf()(url).alias("link_locale"))


ORACLE_LOCALE = """
SELECT doc_id,
       CASE WHEN doc_id % 7 = 0 THEN NULL
            WHEN doc_id % 5 = 0 THEN NULL
            ELSE lang END AS link_locale
FROM documents
"""


# ---------------------------------------------------------------------------
# Relational analogs of the pipeline's joins/dedups (SURVEY.md §2.4-2.5)
# ---------------------------------------------------------------------------


def q_registry_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-wins dedup (registry semantics J1/A2): latest event per user."""
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    window = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("_rn", F.row_number().over(window))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


ORACLE_LAST_WINS = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events) WHERE rn = 1
"""


def q_crawl_first_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup (crawl semantics A1): earliest event per user."""
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    window = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        events.withColumn("_rn", F.row_number().over(window))
        .where(F.col("_rn") == 1)
        .select("user_id", "event_id", "event_type")
    )


ORACLE_FIRST_WINS = """
SELECT user_id, event_id, event_type FROM (
  SELECT user_id, event_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) rn
  FROM events) WHERE rn = 1
"""


def q_symmetrize_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-reverse-edge detection (translation symmetrization J7) as an
    anti-join over a derived edge list."""
    lineitem = _t(spark, sf_dir, "lineitem")
    edges = (
        lineitem.select(
            (F.col("l_partkey") % 200).alias("a"), (F.col("l_suppkey") % 100).alias("b")
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    reverse = edges.select(F.col("a").alias("rb"), F.col("b").alias("ra"))
    return edges.join(
        reverse, (edges["a"] == reverse["ra"]) & (edges["b"] == reverse["rb"]), "left_anti"
    ).select("a", "b")


ORACLE_SYMMETRIZE = """
WITH edges AS (
  SELECT DISTINCT l_partkey % 200 AS a, l_suppkey % 100 AS b
  FROM lineitem WHERE l_partkey % 200 <> l_suppkey % 100)
SELECT a, b FROM edges e
WHERE NOT EXISTS (SELECT 1 FROM edges r WHERE r.a = e.b AND r.b = e.a)
"""


def q_resolution_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL->entity resolution analog (J2/J3): broadcast-join lineitem spans
    against the small part dimension, aggregate per brand."""
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        )
    )


ORACLE_RESOLUTION = """
SELECT p_brand, count(*) AS n_items,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style agg: map-side partial aggregation, no join."""
    lineitem = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


ORACLE_PRICING = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + filter + agg: orders x customer segment counts by priority."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_mktsegment") == "BUILDING")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.avg("o_totalprice"), 2).alias("avg_price"))
    )


ORACLE_ORDER_PRIORITY = """
SELECT o_orderpriority, count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed aggregation (batch form of the streaming op)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))


ORACLE_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event picks up the latest order the same
    user had placed at event time (union-of-streams + running window — one
    shuffle, no per-key pair blow-up; see operators/asof.py)."""
    from wpextract_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = _t(spark, sf_dir, "orders")
    joined = asof_join(
        events,
        orders,
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        right_seq="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey"),
        F.round("asof_o_totalprice", 2).alias("asof_o_totalprice"),
    )


# DuckDB's native ASOF JOIN has no tie-break knob, so the oracle states the
# exact rule (latest o_orderdate <= ts, greatest o_orderkey on date ties) as
# a correlated LATERAL top-1 instead.
ORACLE_ASOF_JOIN = """
SELECT e.event_id, e.user_id,
       o.o_orderkey AS asof_o_orderkey,
       round(o.o_totalprice, 2) AS asof_o_totalprice
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM orders o
  WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) o ON TRUE
"""


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each click picks the user's next purchase at or
    after the click (time-to-conversion shape) — the time-mirrored scan of
    the same union-of-streams window (operators/asof.py)."""
    from wpextract_spark.operators.asof import asof_join

    events = _t(spark, sf_dir, "events")
    clicks = events.where(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        clicks,
        purchases,
        left_on="user_id",
        right_on="p_user",
        left_time="ts",
        right_time="p_ts",
        value_cols=["p_id", "p_value"],
        right_seq="p_id",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_p_id"),
        F.round("asof_p_value", 6).cast("double").alias("asof_p_value"),
    )


ORACLE_ASOF_FORWARD = """
SELECT c.event_id, c.user_id,
       p.event_id AS asof_p_id,
       CAST(round(p.value, 6) AS DOUBLE) AS asof_p_value
FROM events c
LEFT JOIN LATERAL (
  SELECT event_id, value FROM events p
  WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
    AND p.ts >= c.ts
  ORDER BY p.ts ASC, p.event_id ASC LIMIT 1) p ON TRUE
WHERE c.event_type = 'click'
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the event stream (30-min gap): session
    rollups via two stacked windows over one partition-by-user exchange
    (operators/sessionize.py)."""
    from wpextract_spark.operators.sessionize import sessionize

    return sessionize(
        _t(spark, sf_dir, "events").select("user_id", "ts", "value"),
        key="user_id",
        time="ts",
        gap_seconds=1800,
        value="value",
    )


ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts, value,
         -- DuckDB window sum(int) yields HUGEINT; the driver hasher renders
         -- int128 differently from Spark's BIGINT — cast (VERDICT r2 item 1).
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_seq
  FROM g)
SELECT user_id, session_seq,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us,
       CAST(round(sum(value), 6) AS DOUBLE) AS sum_value
FROM s GROUP BY 1, 2
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self band join on the event stream (same-user events within the 4
    hours after each event, itself included) via 2x bucket replication
    instead of a per-key cross product (operators/rangejoin.py), rolled up
    per anchor event."""
    from wpextract_spark.operators.rangejoin import range_join

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    follow = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("f_user"),
        F.col("ts").alias("f_ts"),
        F.col("value").alias("f_value"),
    )
    pairs = range_join(
        events,
        follow,
        left_on="user_id",
        right_on="f_user",
        left_time="ts",
        right_time="f_ts",
        window_seconds=4 * 3600,
    )
    return pairs.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("n_follow_4h"),
        F.round(F.sum("f_value"), 6).cast("double").alias("sum_follow_value"),
    )


ORACLE_RANGE_JOIN = """
SELECT e.event_id,
       count(*) AS n_follow_4h,
       CAST(round(sum(f.value), 6) AS DOUBLE) AS sum_follow_value
FROM events e
JOIN events f
  ON f.user_id = e.user_id
 AND f.ts >= e.ts
 AND f.ts <= e.ts + INTERVAL 4 HOUR
GROUP BY 1
"""


def q_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dimension THETA join: classify events into value bands by
    range membership against a literal 4-row tier table. The right physical
    shape is an explicit broadcast of the dim + nested-loop join (each
    event scans 4 rows JVM-side) — never a shuffle; the classic alternative
    spelling is a CASE expression, but the dim-join form is what survives
    when the bands table is data, not code."""
    events = _t(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [("free", 0.0, 5.0), ("basic", 5.0, 20.0),
         ("plus", 20.0, 50.0), ("premium", 50.0, 1e18)],
        "band string, lo double, hi double",
    )
    return (
        events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
            "inner",
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).cast("double").alias("sum_value"),
        )
    )


ORACLE_VALUE_BANDS = """
WITH bands(band, lo, hi) AS (
  VALUES ('free', 0.0, 5.0), ('basic', 5.0, 20.0),
         ('plus', 20.0, 50.0), ('premium', 50.0, 1e18))
SELECT band, count(*) AS n_events,
       CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


def q_user_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user spend rollup ranked into deciles (NTILE) with cumulative
    share — the classic heavy-user analytics cut. The global window runs
    over the per-user AGGREGATE (one row per user — tiny next to the event
    stream at any scale), with a fully deterministic order (rounded sum
    desc, user_id) so both engines tile identically."""
    events = _t(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        F.round(F.sum("value"), 6).cast("double").alias("total_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w = PyWindow.orderBy(F.desc("total_value"), F.asc("user_id"))
    return per_user.select(
        "user_id",
        "total_value",
        "n_events",
        F.ntile(10).over(w).alias("decile"),
        F.round(
            F.sum("total_value").over(
                w.rowsBetween(PyWindow.unboundedPreceding, PyWindow.currentRow)
            )
            / F.sum("total_value").over(
                PyWindow.partitionBy()
            ),
            6,
        ).alias("cum_share"),
    )


ORACLE_USER_DECILES = """
WITH per_user AS (
  SELECT user_id,
         CAST(round(sum(value), 6) AS DOUBLE) AS total_value,
         count(*) AS n_events
  FROM events GROUP BY 1)
SELECT user_id, total_value, n_events,
       ntile(10) OVER w AS decile,
       round(sum(total_value) OVER (ORDER BY total_value DESC, user_id
                                    ROWS UNBOUNDED PRECEDING)
             / sum(total_value) OVER (), 6) AS cum_share
FROM per_user WINDOW w AS (ORDER BY total_value DESC, user_id)
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted index with tf-ranked, k-bounded posting lists
    (operators/textstats.py:inverted_index).

    The contract wrapper stringifies ``postings`` — the driver's
    canonicalizer pandas-sorts result columns and cannot hash list values
    (VERDICT r2 item 2); the operator itself keeps the typed array."""
    from wpextract_spark.operators.textstats import inverted_index

    idx = inverted_index(
        _t(spark, sf_dir, "documents"), min_df=2, postings_k=5
    )
    return idx.withColumn(
        "postings",
        F.array_join(F.col("postings").cast("array<string>"), ","),
    )


#: Fixed retrieval query for q_bm25 (terms present in the synthetic corpus).
_BM25_TERMS = ("spark", "query", "join", "vector")


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 retrieval scoring against a fixed bag-of-terms query
    (operators/textstats.py:bm25_scores). Scores rounded to 6 dp — the
    per-document sum order differs between engines."""
    from wpextract_spark.operators.textstats import bm25_scores

    return bm25_scores(_t(spark, sf_dir, "documents"), list(_BM25_TERMS))


ORACLE_BM25 = f"""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '{WS_SQL}')) AS dl,
         unnest(string_split_regex(trim(text), '{WS_SQL}')) AS token
  FROM documents),
tf AS (
  SELECT doc_id, token, CAST(count(*) AS DOUBLE) AS tf, min(dl) AS dl
  FROM t WHERE token IN ('spark','query','join','vector')
  GROUP BY doc_id, token),
dfreq AS (SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token),
totals AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         avg(len(string_split_regex(trim(text), '{WS_SQL}'))) AS avgdl
  FROM documents)
SELECT doc_id,
       round(sum(
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
       ), 6) AS bm25
FROM tf JOIN dfreq USING (token) CROSS JOIN totals
GROUP BY doc_id
"""


def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality signal: bigram add-alpha model trained on the
    corpus itself, each document scored by the perplexity the model assigns
    it (operators/lmscore.py). The oracle restates the exact probability
    expression with DuckDB's zipping parallel-unnest bigrams."""
    from wpextract_spark.operators.lmscore import lm_perplexity

    return lm_perplexity(_t(spark, sf_dir, "documents"), alpha=0.1)


ORACLE_LM_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS w
  FROM documents WHERE text IS NOT NULL),
bi AS (
  SELECT doc_id, unnest(w[1:len(w)-1]) AS w1, unnest(w[2:len(w)]) AS w2
  FROM toks WHERE len(w) >= 2),
c12 AS (SELECT w1, w2, count(*) AS c FROM bi GROUP BY 1, 2),
ctx AS (SELECT w1, sum(c) AS c1 FROM c12 GROUP BY 1),
v AS (SELECT CAST(count(DISTINCT u.t) AS DOUBLE) AS vs
      FROM (SELECT unnest(w) AS t FROM toks) u),
nll AS (
  SELECT b.doc_id, -ln((c.c + 0.1) / (x.c1 + 0.1 * v.vs)) AS nll
  FROM bi b JOIN c12 c USING (w1, w2) JOIN ctx x USING (w1) CROSS JOIN v)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nll), 6) AS avg_nll, round(exp(avg(nll)), 6) AS ppl
FROM nll GROUP BY doc_id
"""


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram collocations scored by PMI
    (operators/textstats.py:collocations)."""
    from wpextract_spark.operators.textstats import collocations

    return collocations(_t(spark, sf_dir, "documents"), min_pair_count=5)


ORACLE_COLLOCATIONS = rf"""
WITH tok AS (
  SELECT string_split_regex(trim(text), '{WS_SQL}') AS ts FROM documents),
uni AS (SELECT unnest(ts) AS w FROM tok),
ucnt AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
big AS (
  SELECT ts[i] AS w1, ts[i + 1] AS w2
  FROM tok, unnest(range(1, len(ts))) AS r(i)),
tot AS (
  SELECT (SELECT CAST(count(*) AS DOUBLE) FROM uni) AS n_uni,
         (SELECT CAST(count(*) AS DOUBLE) FROM big) AS n_big),
pcnt AS (
  SELECT w1, w2, count(*) AS pair_count FROM big
  GROUP BY 1, 2 HAVING count(*) >= 5)
SELECT p.w1, p.w2, p.pair_count,
       round(ln((p.pair_count * t.n_uni * t.n_uni)
                / (t.n_big * c1.c * c2.c)), 6) AS pmi
FROM pcnt p
JOIN ucnt c1 ON c1.w = p.w1
JOIN ucnt c2 ON c2.w = p.w2
CROSS JOIN tot t
"""


def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLAP CUBE over (event_type, hour): all four grouping sets in one
    pass (Spark plans a single Expand + hash aggregate — one shuffle for
    every subtotal level, not one scan per level)."""
    events = _t(spark, sf_dir, "events")
    return events.cube(
        F.col("event_type"), F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).cast("double").alias("sum_value"),
    )


ORACLE_EVENTS_CUBE = """
SELECT event_type, date_trunc('hour', ts) AS hour,
       count(*) AS n_events,
       CAST(round(sum(value), 2) AS DOUBLE) AS sum_value
FROM events GROUP BY CUBE (event_type, date_trunc('hour', ts))
"""


ORACLE_INVERTED_INDEX = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '{WS_SQL}')) AS token
  FROM documents),
tf AS (SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2),
r AS (SELECT token, doc_id, tf,
             row_number() OVER (PARTITION BY token
                                ORDER BY tf DESC, doc_id) AS rk
      FROM tf)
SELECT token, count(*) AS doc_freq,
       array_to_string(
         list(CAST(doc_id AS VARCHAR) ORDER BY tf DESC, doc_id)
           FILTER (WHERE rk <= 5),
         ',') AS postings
FROM r GROUP BY token HAVING count(*) >= 2
"""


# ---------------------------------------------------------------------------
# Training-data operators
# ---------------------------------------------------------------------------


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups on a 5-word prefix key (full texts are unique in the
    synthetic corpus; the prefix creates realistic collision groups)."""
    docs = _t(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split(F.trim("text"), WS_SQL), 1, 5))
    return exact_duplicate_groups(docs.select("doc_id", prefix.alias("text")))


ORACLE_DEDUP_EXACT = rf"""
WITH keyed AS (
  SELECT doc_id,
         md5(array_to_string((string_split_regex(trim(text), '{WS_SQL}'))[1:5], ' ')) AS text_hash
  FROM documents)
SELECT text_hash, count(*) AS n_dups, min(doc_id) AS keep_id
FROM keyed GROUP BY text_hash HAVING count(*) > 1
"""


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_signatures(docs, k=4)


ORACLE_MINHASH = rf"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '{WS_SQL}'))) AS w
  FROM documents)
SELECT doc_id,
       min(md5('0:' || w)) AS sig_0, min(md5('1:' || w)) AS sig_1,
       min(md5('2:' || w)) AS sig_2, min(md5('3:' || w)) AS sig_3
FROM w GROUP BY doc_id
"""


#: Shared CTE prefix: 8-hash MinHash -> 2 bands of 4 rows -> bucket cap 100
#: (the mega-bucket guard mirrored from ``lsh_candidate_pairs``).
_LSH_BANDED_CTE = rf"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '{WS_SQL}'))) AS w
  FROM documents),
sig AS (
  SELECT doc_id,
         min(md5('0:' || w)) AS s0, min(md5('1:' || w)) AS s1,
         min(md5('2:' || w)) AS s2, min(md5('3:' || w)) AS s3,
         min(md5('4:' || w)) AS s4, min(md5('5:' || w)) AS s5,
         min(md5('6:' || w)) AS s6, min(md5('7:' || w)) AS s7
  FROM w GROUP BY doc_id),
banded AS (
  SELECT doc_id, band_key FROM (
    SELECT doc_id, unnest([
      '0|' || s0 || '|' || s1 || '|' || s2 || '|' || s3,
      '1|' || s4 || '|' || s5 || '|' || s6 || '|' || s7]) AS band_key
    FROM sig)
  QUALIFY count(*) OVER (PARTITION BY band_key) <= 100),
lsh_pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_bands
  FROM banded l JOIN banded r ON l.band_key = r.band_key AND l.doc_id < r.doc_id
  GROUP BY 1, 2)
"""


def q_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return lsh_candidate_pairs(docs, k=8, bands=2, max_bucket=100)


ORACLE_LSH_PAIRS = _LSH_BANDED_CTE + "SELECT id_a, id_b, n_bands FROM lsh_pairs"


def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-path composition: capped LSH proposes candidate pairs,
    n-gram Jaccard verifies them — no corpus-wide quadratic join anywhere."""
    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(docs, k=8, bands=2, max_bucket=100)
    return ngram_jaccard_pairs(
        docs, n=3, threshold=0.05, candidates=cands
    ).withColumn("jaccard", F.round("jaccard", 6))


ORACLE_DEDUP_PIPELINE = (
    _LSH_BANDED_CTE
    + rf""",
ws AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws FROM documents),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS grams
  FROM ws WHERE len(ws) >= 3),
e AS (SELECT doc_id, unnest(grams) AS g FROM g),
sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g),
common AS (
  SELECT p.id_a, p.id_b, count(*) AS common
  FROM lsh_pairs p
  JOIN e l ON l.doc_id = p.id_a
  JOIN e r ON r.doc_id = p.id_b AND r.g = l.g
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(common * 1.0 / (sa.n_grams + sb.n_grams - common), 6) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE common * 1.0 / (sa.n_grams + sb.n_grams - common) >= 0.05
"""
)


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full dedup verdict: LSH propose -> Jaccard verify -> connected
    components (large-star/small-star) -> per-doc keep-list."""
    from wpextract_spark.operators.clustering import near_dup_keep_list

    docs = _t(spark, sf_dir, "documents")
    cands = lsh_candidate_pairs(docs, k=8, bands=2, max_bucket=100)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.05, candidates=cands)
    return near_dup_keep_list(docs, pairs)


#: Transitive closure restated as a recursive CTE: reach(n, lab) enumerates
#: every (node, reachable-node) pair over the bidirected near-dup edges, and
#: min(lab) per node is exactly the component's canonical (smallest) id —
#: the same labels large-star/small-star converges to.
ORACLE_DEDUP_CLUSTERS = (
    _LSH_BANDED_CTE.replace("WITH w AS", "WITH RECURSIVE w AS", 1)
    + rf""",
ws AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws FROM documents),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS grams
  FROM ws WHERE len(ws) >= 3),
e AS (SELECT doc_id, unnest(grams) AS g FROM g),
sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g),
common AS (
  SELECT p.id_a, p.id_b, count(*) AS common
  FROM lsh_pairs p
  JOIN e l ON l.doc_id = p.id_a
  JOIN e r ON r.doc_id = p.id_b AND r.g = l.g
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE common * 1.0 / (sa.n_grams + sb.n_grams - common) >= 0.05),
bidir AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(n, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM bidir)
  UNION
  SELECT b.u, r.lab FROM bidir b JOIN reach r ON r.n = b.v),
cc AS (SELECT n, min(lab) AS root FROM reach GROUP BY n)
SELECT d.doc_id,
       coalesce(cc.root, d.doc_id) AS cluster_id,
       (cc.root IS NULL OR cc.root = d.doc_id) AS keep
FROM documents d LEFT JOIN cc ON cc.n = d.doc_id
"""
)


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship composition: quality rules + exact dedup + near-dup
    clustering into one keep/reject verdict with reject attribution."""
    from wpextract_spark.operators.curation import curation_pipeline

    return curation_pipeline(_t(spark, sf_dir, "documents"))


def _oracle_curation_pipeline() -> str:
    from wpextract_spark.operators.corpusfilters import (
        C4_MIN_KEPT_LINES,
        C4_MIN_WORDS_PER_LINE,
        C4_TERMINAL_RE,
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )

    return (
        _LSH_BANDED_CTE.replace("WITH w AS", "WITH RECURSIVE w AS", 1)
        + rf""",
ws AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws FROM documents),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS grams
  FROM ws WHERE len(ws) >= 3),
e AS (SELECT doc_id, unnest(grams) AS g FROM g),
sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g),
common AS (
  SELECT p.id_a, p.id_b, count(*) AS common
  FROM lsh_pairs p
  JOIN e l ON l.doc_id = p.id_a
  JOIN e r ON r.doc_id = p.id_b AND r.g = l.g
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM common
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE common * 1.0 / (sa.n_grams + sb.n_grams - common) >= 0.05),
bidir AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach(n, lab) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM bidir)
  UNION
  SELECT b.u, r.lab FROM bidir b JOIN reach r ON r.n = b.v),
cc AS (SELECT n, min(lab) AS root FROM reach GROUP BY n),
gw AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '{WS_SQL}') AS ws2,
         length(regexp_replace(trim(text), '{WS_SQL}', '', 'g')) AS twc
  FROM documents),
gq AS (
  SELECT doc_id,
         (len(ws2) BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
          AND twc * 1.0 / greatest(len(ws2), 1)
              BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}
          AND len(list_filter(ws2, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
              / greatest(len(ws2), 1) >= {GOPHER_MIN_ALPHA_FRAC}
          AND (len(string_split(text, '#')) - 1
               + len(string_split_regex(text, '\.\.\.')) - 1) * 1.0
              / greatest(len(ws2), 1) <= {GOPHER_MAX_SYMBOL_RATIO}) AS gopher_keep
  FROM gw),
c4 AS (
  SELECT doc_id,
         (NOT contains(lower(text), 'lorem ipsum')
          AND NOT contains(text, '{{')
          AND len(list_filter(string_split(text, chr(10)),
                l -> regexp_matches(trim(l), '{C4_TERMINAL_RE}')
                     AND len(string_split_regex(trim(l), '{WS_SQL}'))
                         >= {C4_MIN_WORDS_PER_LINE}
                     AND NOT contains(lower(l), 'javascript')))
              >= {C4_MIN_KEPT_LINES}) AS c4_keep
  FROM documents),
ex AS (
  SELECT doc_id,
         doc_id = min(doc_id) OVER (PARTITION BY
           md5(array_to_string((string_split_regex(trim(text), '{WS_SQL}'))[1:5], ' '))
         ) AS exact_keep
  FROM documents),
nd AS (
  SELECT d.doc_id, (cc.root IS NULL OR cc.root = d.doc_id) AS neardup_keep
  FROM documents d LEFT JOIN cc ON cc.n = d.doc_id)
SELECT gq.doc_id, gopher_keep, c4_keep, exact_keep, neardup_keep,
       TRUE AS containment_keep,
       (gopher_keep AND c4_keep AND exact_keep AND neardup_keep) AS keep,
       CASE WHEN NOT gopher_keep THEN 'gopher'
            WHEN NOT c4_keep THEN 'c4'
            WHEN NOT exact_keep THEN 'exact_dup'
            WHEN NOT neardup_keep THEN 'near_dup'
            ELSE '' END AS reject_reason
FROM gq JOIN c4 USING (doc_id) JOIN ex USING (doc_id) JOIN nd USING (doc_id)
"""
    )


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    return ngram_jaccard_pairs(docs, n=3, threshold=0.02).withColumn(
        "jaccard", F.round("jaccard", 6)
    )


ORACLE_NGRAM_JACCARD = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws
  FROM documents WHERE doc_id < 100),
g AS (
  SELECT doc_id,
         list_distinct([array_to_string(ws[i:i+2], ' ') for i in range(1, len(ws) - 1)]) AS grams
  FROM w WHERE len(ws) >= 3),
e AS (SELECT doc_id, unnest(grams) AS g FROM g),
sizes AS (SELECT doc_id, len(grams) AS n_grams FROM g),
pairs AS (
  SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS common
  FROM e l JOIN e r ON l.g = r.g AND l.doc_id < r.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(common * 1.0 / (sa.n_grams + sb.n_grams - common), 6) AS jaccard
FROM pairs
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE common * 1.0 / (sa.n_grams + sb.n_grams - common) >= 0.02
"""


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return simhash(docs, bits=8)


def _oracle_simhash(bits: int = 8) -> str:
    votes = ", ".join(
        f"sum(CASE WHEN substr(md5(w), {b + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
        f"THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(bits)
    )
    concat = " || ".join(f"(CASE WHEN v_{b} > 0 THEN '1' ELSE '0' END)" for b in range(bits))
    return rf"""
WITH w AS (
  SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '{WS_SQL}'))) AS w
  FROM documents),
v AS (SELECT doc_id, {votes} FROM w GROUP BY doc_id)
SELECT doc_id, {concat} AS simhash FROM v
"""


_SIM_QUERY = [1.0] + [0.0] * 63


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return cosine_topk(emb, _SIM_QUERY, k=20)


ORACLE_SIM_TOPK = """
SELECT vec_id,
       round(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding])), 6) AS cos_sim
FROM embeddings
ORDER BY cos_sim DESC, vec_id ASC LIMIT 20
"""


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return lsh_topk(emb, _SIM_QUERY, k=10, n_planes=4)


def _oracle_sim_lsh() -> str:
    dim = 64
    planes = [hyperplane(p, dim) for p in range(4)]
    query_bucket = "".join("1" if p[0] > 0 else "0" for p in planes)
    plane_sql = []
    for plane in planes:
        lit = "[" + ", ".join(f"{v!r}" for v in plane) + "]"
        plane_sql.append(
            f"(CASE WHEN list_sum([CAST(embedding[i+1] AS DOUBLE) * ({lit})[i+1] "
            f"for i in range({dim})]) > 0 THEN '1' ELSE '0' END)"
        )
    bucket = " || ".join(plane_sql)
    return f"""
WITH b AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings)
SELECT vec_id,
       round(CAST(embedding[1] AS DOUBLE)
             / sqrt(list_sum([CAST(x AS DOUBLE) * x for x in embedding])), 6) AS cos_sim
FROM b WHERE bucket = '{query_bucket}'
ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
"""


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: deterministic coarse quantizer (vec_id < n_lists as
    centroids), probe the 3 best lists, exact re-rank inside them."""
    emb = _t(spark, sf_dir, "embeddings")
    return ivf_topk(emb, _SIM_QUERY, k=10, n_lists=8, n_probe=3)


def _oracle_sim_ivf(dim: int = 64, n_lists: int = 8, n_probe: int = 3, k: int = 10) -> str:
    # query = [1, 0, 0, ...]: q . v == v[1] and |q| == 1.
    dot = (
        f"list_sum([CAST(e.embedding[i+1] AS DOUBLE) * CAST(c.cv[i+1] AS DOUBLE) "
        f"for i in range({dim})])"
    )
    norm_e = "sqrt(list_sum([CAST(x AS DOUBLE) * x for x in e.embedding]))"
    norm_c = "sqrt(list_sum([CAST(x AS DOUBLE) * x for x in c.cv]))"
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cv FROM embeddings WHERE vec_id < {n_lists}),
score AS (
  SELECT e.vec_id, c.cid, {dot} / ({norm_e} * {norm_c}) AS s
  FROM embeddings e CROSS JOIN c),
assigned AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cid ASC) rn
    FROM score) WHERE rn = 1),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY CAST(cv[1] AS DOUBLE) / sqrt(list_sum([CAST(x AS DOUBLE) * x for x in cv])) DESC,
               cid ASC) rn
    FROM c) WHERE rn <= {n_probe})
SELECT e.vec_id, a.list_id,
       round(CAST(e.embedding[1] AS DOUBLE) / sqrt(list_sum([CAST(x AS DOUBLE) * x for x in e.embedding])), 6) AS cos_sim
FROM embeddings e
JOIN assigned a ON a.vec_id = e.vec_id
WHERE a.list_id IN (SELECT cid FROM probe)
ORDER BY cos_sim DESC, e.vec_id ASC LIMIT {k}
"""


def q_similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: 2 iterations of
    deterministic distributed Lloyd's k-means (assign by cosine, mean by
    posexplode + partial-agg, centroids rounded to 6dp so the SQL oracle
    lands on identical literals), then the same probe + exact re-rank."""
    from wpextract_spark.operators.similarity import kmeans_centroids

    emb = _t(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(emb, n_lists=8, n_iter=2)
    return ivf_topk(emb, _SIM_QUERY, k=10, n_probe=3, centroids=cents)


def _kmeans_cte(
    dim: int,
    n_lists: int,
    n_iter: int,
    prefix: str = "",
    slice_off: int | None = None,
    lead_with: bool = True,
) -> tuple[list[str], str, dict]:
    """Shared unrolled-CTE restatement of operators/similarity.py's
    deterministic Lloyd's k-means: returns (CTE parts, final-centroid CTE
    name, the cosine sub-expressions) for oracles that train the same
    quantizer (q_similarity_ivf_kmeans, q_semantic_dedup, q_similarity_pq).

    ``prefix`` namespaces every CTE so several quantizers compose in one
    statement (PQ trains one per subspace); ``slice_off`` trains on the
    1-based ``[off+1 : off+dim]`` subvector instead of the full embedding;
    ``lead_with=False`` drops the ``WITH`` for non-first builders."""
    en = f"{prefix}e"
    dot = f"list_sum([e.v[i+1] * c.cv[i+1] for i in range({dim})])"
    norm_e = "sqrt(list_sum([x * x for x in e.v]))"
    norm_c = "sqrt(list_sum([x * x for x in c.cv]))"
    vexpr = "[CAST(x AS DOUBLE) for x in embedding]"
    if slice_off is not None:
        vexpr = f"({vexpr})[{slice_off + 1}:{slice_off + dim}]"
    head = "WITH " if lead_with else ""
    parts = [
        f"""{head}{en} AS (
  SELECT vec_id, {vexpr} AS v FROM embeddings),
{prefix}c0 AS (SELECT vec_id AS cid, v AS cv FROM {en} e WHERE vec_id < {n_lists})"""
    ]
    for it in range(n_iter):
        prev, nxt = f"{prefix}c{it}", f"{prefix}c{it + 1}"
        parts.append(
            f"""{prefix}a{it} AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {dot} / ({norm_e} * {norm_c}) DESC, c.cid ASC) rn
    FROM {en} e CROSS JOIN {prev} c) WHERE rn = 1),
{prefix}m{it} AS (
  SELECT a.cid, t.i AS pos, round(avg(e.v[t.i + 1]), 6) AS m
  FROM {prefix}a{it} a JOIN {en} e ON a.vec_id = e.vec_id CROSS JOIN range({dim}) t(i)
  GROUP BY a.cid, t.i),
{nxt} AS (
  SELECT p.cid,
         CASE WHEN count(m.m) = 0 THEN any_value(p.cv)
              ELSE list(m.m ORDER BY m.pos) END AS cv
  FROM {prev} p LEFT JOIN {prefix}m{it} m ON m.cid = p.cid
  GROUP BY p.cid)"""
        )
    final = f"{prefix}c{n_iter}"
    return parts, final, {"dot": dot, "norm_e": norm_e, "norm_c": norm_c, "e": en}


def _oracle_sim_ivf_kmeans(
    dim: int = 64, n_lists: int = 8, n_iter: int = 2, n_probe: int = 3, k: int = 10
) -> str:
    # query = [1, 0, 0, ...]: q . v == v[1] and |q| == 1 (same as _SIM_QUERY).
    parts, final, x = _kmeans_cte(dim, n_lists, n_iter)
    dot, norm_e, norm_c = x["dot"], x["norm_e"], x["norm_c"]
    parts = parts + [
        f"""assigned AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {dot} / ({norm_e} * {norm_c}) DESC, c.cid ASC) rn
    FROM e CROSS JOIN {final} c) WHERE rn = 1),
probe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY cv[1] / sqrt(list_sum([x * x for x in cv])) DESC, cid ASC) rn
    FROM {final}) WHERE rn <= {n_probe})"""
    ]
    body = ",\n".join(parts)
    return f"""{body}
SELECT e.vec_id, a.list_id,
       round(e.v[1] / sqrt(list_sum([x * x for x in e.v])), 6) AS cos_sim
FROM e JOIN assigned a ON a.vec_id = e.vec_id
WHERE a.list_id IN (SELECT cid FROM probe)
ORDER BY cos_sim DESC, e.vec_id ASC LIMIT {k}
"""


def q_similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN with exact re-rank
    (operators/similarity.py:pq_topk): 8 subspace codebooks from the shared
    deterministic Lloyd's, ADC scoring against plan-literal lookup tables,
    TakeOrdered refine + re-rank. The query vector is hyperplane(99, 64) —
    nonzero in every component so all 8 subspaces contribute to the score."""
    from wpextract_spark.operators.similarity import hyperplane, pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, hyperplane(99, 64), k=10, m=8, ks=16, n_iter=2, refine_k=50)


def _oracle_similarity_pq(
    dim: int = 64,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    refine_k: int = 50,
    k: int = 10,
) -> str:
    import math as _math

    from wpextract_spark.operators.similarity import hyperplane

    query = hyperplane(99, dim)
    dsub = dim // m
    qnorm = _math.sqrt(sum(x * x for x in query))
    parts: list[str] = []
    picks: list[str] = []
    for s in range(m):
        p, final, x = _kmeans_cte(
            dsub, ks, n_iter, prefix=f"s{s}", slice_off=s * dsub, lead_with=(s == 0)
        )
        parts += p
        qs = query[s * dsub : (s + 1) * dsub]
        qs_lit = "[" + ", ".join(repr(v) for v in qs) + "]"
        l2 = (
            f"list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) "
            f"for i in range({dsub})])"
        )
        parts.append(
            f"""s{s}pick AS (
  SELECT vec_id, w FROM (
    SELECT e.vec_id,
           list_sum([({qs_lit})[i+1] * c.cv[i+1] for i in range({dsub})]) AS w,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2} ASC, c.cid ASC) rn
    FROM {x["e"]} e CROSS JOIN {final} c) WHERE rn = 1)"""
        )
        picks.append(f"s{s}pick")
    q_lit = "[" + ", ".join(repr(v) for v in query) + "]"
    wsum = " + ".join(f"{p}.w" for p in picks)
    joins = "\n  ".join(f"JOIN {p} ON {p}.vec_id = f.vec_id" for p in picks)
    parts.append(
        f"""pqfull AS (
  SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v FROM embeddings),
pqapprox AS (
  SELECT f.vec_id, f.v,
         round(({wsum}) / ({qnorm!r} * sqrt(list_sum([x * x for x in f.v]))), 6)
           AS approx_cos
  FROM pqfull f
  {joins}),
pqcand AS (
  SELECT * FROM pqapprox ORDER BY approx_cos DESC, vec_id ASC LIMIT {refine_k})"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT vec_id, approx_cos,
       round(list_sum([v[i+1] * ({q_lit})[i+1] for i in range({dim})])
             / ({qnorm!r} * sqrt(list_sum([x * x for x in v]))), 6) AS cos_sim
FROM pqcand ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
"""


def q_similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (operators/similarity.py:ivfpq_topk): coarse
    k-means routing (n_probe of n_lists inverted lists) prunes the corpus
    BEFORE the PQ ADC scan runs on it, exact re-rank of the refine set —
    FAISS's IndexIVFPQ shape, the standard billion-scale configuration.
    Both quantizers are the shared deterministic Lloyd's, so the oracle
    composes the same two CTE builders the IVF and PQ oracles use."""
    from wpextract_spark.operators.similarity import hyperplane, ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, hyperplane(99, 64), k=10, n_lists=8, n_probe=3, m=8, ks=16,
        n_iter=2, refine_k=50,
    )


def _oracle_similarity_ivfpq(
    dim: int = 64,
    n_lists: int = 8,
    n_probe: int = 3,
    m: int = 8,
    ks: int = 16,
    n_iter: int = 2,
    refine_k: int = 50,
    k: int = 10,
) -> str:
    import math as _math

    from wpextract_spark.operators.similarity import hyperplane

    query = hyperplane(99, dim)
    dsub = dim // m
    qnorm = _math.sqrt(sum(x * x for x in query))
    q_lit = "[" + ", ".join(repr(v) for v in query) + "]"

    # Coarse quantizer: full-dim k-means (prefix g), probe + assignment.
    parts, gfinal, gx = _kmeans_cte(dim, n_lists, n_iter, prefix="g")
    dot, norm_e, norm_c = gx["dot"], gx["norm_e"], gx["norm_c"]
    qdot_c = f"list_sum([({q_lit})[i+1] * cv[i+1] for i in range({dim})])"
    parts.append(
        f"""gassigned AS (
  SELECT vec_id, cid AS list_id FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {dot} / ({norm_e} * {norm_c}) DESC, c.cid ASC) rn
    FROM {gx["e"]} e CROSS JOIN {gfinal} c) WHERE rn = 1),
gprobe AS (
  SELECT cid FROM (
    SELECT cid, row_number() OVER (
      ORDER BY {qdot_c} / sqrt(list_sum([x * x for x in cv])) DESC, cid ASC) rn
    FROM {gfinal}) WHERE rn <= {n_probe})"""
    )

    # Fine quantizer: per-subspace codebooks + ADC picks (PQ oracle shape).
    picks: list[str] = []
    for s in range(m):
        p, final, x = _kmeans_cte(
            dsub, ks, n_iter, prefix=f"s{s}", slice_off=s * dsub, lead_with=False
        )
        parts += p
        qs = query[s * dsub : (s + 1) * dsub]
        qs_lit = "[" + ", ".join(repr(v) for v in qs) + "]"
        l2 = (
            f"list_sum([(e.v[i+1] - c.cv[i+1]) * (e.v[i+1] - c.cv[i+1]) "
            f"for i in range({dsub})])"
        )
        parts.append(
            f"""s{s}pick AS (
  SELECT vec_id, w FROM (
    SELECT e.vec_id,
           list_sum([({qs_lit})[i+1] * c.cv[i+1] for i in range({dsub})]) AS w,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {l2} ASC, c.cid ASC) rn
    FROM {x["e"]} e CROSS JOIN {final} c) WHERE rn = 1)"""
        )
        picks.append(f"s{s}pick")

    wsum = " + ".join(f"{p}.w" for p in picks)
    joins = "\n  ".join(f"JOIN {p} ON {p}.vec_id = f.vec_id" for p in picks)
    parts.append(
        f"""ipqfull AS (
  SELECT e.vec_id, e.v, a.list_id
  FROM {gx["e"]} e JOIN gassigned a ON a.vec_id = e.vec_id
  WHERE a.list_id IN (SELECT cid FROM gprobe)),
ipqapprox AS (
  SELECT f.vec_id, f.v, f.list_id,
         round(({wsum}) / ({qnorm!r} * sqrt(list_sum([x * x for x in f.v]))), 6)
           AS approx_cos
  FROM ipqfull f
  {joins}),
ipqcand AS (
  SELECT * FROM ipqapprox ORDER BY approx_cos DESC, vec_id ASC LIMIT {refine_k})"""
    )
    body = ",\n".join(parts)
    return f"""{body}
SELECT vec_id, CAST(list_id AS INTEGER) AS list_id, approx_cos,
       round(list_sum([v[i+1] * ({q_lit})[i+1] for i in range({dim})])
             / ({qnorm!r} * sqrt(list_sum([x * x for x in v]))), 6) AS cos_sim
FROM ipqcand ORDER BY cos_sim DESC, vec_id ASC LIMIT {k}
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: k-means the embedding space
    (same deterministic Lloyd's as q_similarity_ivf_kmeans), then inside
    each cluster drop members whose cosine to a closer-to-centroid member
    exceeds the threshold (operators/similarity.py:semantic_dedup). The
    threshold suits the random synthetic vectors, as in
    q_embedding_near_dups."""
    from wpextract_spark.operators.similarity import semantic_dedup

    return semantic_dedup(
        _t(spark, sf_dir, "embeddings"),
        n_lists=8,
        n_iter=2,
        threshold=0.3,
        max_cluster=500,
    )


def _oracle_semantic_dedup(
    dim: int = 64,
    n_lists: int = 8,
    n_iter: int = 2,
    threshold: float = 0.3,
    max_cluster: int = 500,
) -> str:
    parts, final, x = _kmeans_cte(dim, n_lists, n_iter)
    dot, norm_e, norm_c = x["dot"], x["norm_e"], x["norm_c"]
    pair_dot = f"list_sum([a.v[i+1] * b.v[i+1] for i in range({dim})])"
    norm_a = "sqrt(list_sum([x * x for x in a.v]))"
    norm_b = "sqrt(list_sum([x * x for x in b.v]))"
    parts = parts + [
        f"""assigned AS (
  SELECT vec_id, v, cid, round(cos_raw, 6) AS cos_c FROM (
    SELECT e.vec_id, e.v, c.cid, {dot} / ({norm_e} * {norm_c}) AS cos_raw,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {dot} / ({norm_e} * {norm_c}) DESC, c.cid ASC) rn
    FROM e CROSS JOIN {final} c) WHERE rn = 1),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cid ORDER BY cos_c DESC, vec_id ASC) rk
  FROM assigned),
verified AS (SELECT * FROM ranked WHERE rk <= {max_cluster}),
dups AS (
  SELECT DISTINCT b.vec_id
  FROM verified a JOIN verified b ON a.cid = b.cid AND a.rk < b.rk
  WHERE {pair_dot} / ({norm_a} * {norm_b}) >= {threshold})"""
    ]
    body = ",\n".join(parts)
    return f"""{body}
SELECT r.vec_id, CAST(r.cid AS INTEGER) AS cluster_id, r.cos_c,
       d.vec_id IS NULL AS is_kept
FROM ranked r LEFT JOIN dups d ON r.vec_id = d.vec_id
"""


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: multi-probe sign-LSH (4 independent
    8-plane sets unioned) + exact cosine verify + mega-bucket cap (threshold
    suits the random synthetic vectors)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, threshold=0.3, n_planes=8, n_sets=4, max_bucket=200
    )


def _oracle_emb_near_dups(
    dim: int = 64,
    n_planes: int = 8,
    n_sets: int = 4,
    max_bucket: int = 200,
    threshold: float = 0.3,
) -> str:
    set_sql = []
    for s in range(n_sets):
        plane_sql = []
        for plane in [hyperplane(s * n_planes + p, dim) for p in range(n_planes)]:
            lit = "[" + ", ".join(f"{v!r}" for v in plane) + "]"
            plane_sql.append(
                f"(CASE WHEN list_sum([CAST(embedding[i+1] AS DOUBLE) * ({lit})[i+1] "
                f"for i in range({dim})]) > 0 THEN '1' ELSE '0' END)"
            )
        set_sql.append(f"'{s}|' || " + " || ".join(plane_sql))
    buckets = ", ".join(set_sql)
    dot = (
        f"list_sum([CAST(l.embedding[i+1] AS DOUBLE) * CAST(r.embedding[i+1] AS DOUBLE) "
        f"for i in range({dim})])"
    )
    norm = "sqrt(list_sum([CAST(x AS DOUBLE) * x for x in {s}.embedding]))"
    cos = f"round({dot} / ({norm.format(s='l')} * {norm.format(s='r')}), 6)"
    return f"""
WITH b AS (
  SELECT vec_id, embedding, unnest([{buckets}]) AS bucket FROM embeddings),
capped AS (
  SELECT * FROM b QUALIFY count(*) OVER (PARTITION BY bucket) <= {max_bucket})
SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b, {cos} AS cos_sim
FROM capped l JOIN capped r ON l.bucket = r.bucket AND l.vec_id < r.vec_id
WHERE {cos} >= {threshold}
"""


def q_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signatures, 8-band chunk join with a
    mega-bucket cap, exact Hamming verify via segmented popcount."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, bits=64, bands=8, max_hamming=3, max_bucket=100
    )


def _oracle_simhash_near_dups(
    bits: int = 64, bands: int = 8, max_hamming: int = 3, max_bucket: int = 100
) -> str:
    width = bits // bands
    # Nibbles 32.. come from the second independent hash md5('#' || w),
    # mirroring operators/dedup.py simhash().
    h = "md5(w) || md5('#' || w)" if bits > 32 else "md5(w)"
    votes = ", ".join(
        f"sum(CASE WHEN substr(h, {b + 1}, 1) IN ('8','9','a','b','c','d','e','f') "
        f"THEN 1 ELSE -1 END) AS v_{b}"
        for b in range(bits)
    )
    concat = " || ".join(f"(CASE WHEN v_{b} > 0 THEN '1' ELSE '0' END)" for b in range(bits))
    chunks = ", ".join(
        f"'{b}' || '|' || substr(simhash, {b * width + 1}, {width})" for b in range(bands)
    )
    hamming = " + ".join(
        f"(CASE WHEN substr(sa, {b + 1}, 1) <> substr(sb, {b + 1}, 1) THEN 1 ELSE 0 END)"
        for b in range(bits)
    )
    return rf"""
WITH w AS (
  SELECT doc_id, {h} AS h FROM (
    SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '{WS_SQL}'))) AS w
    FROM documents)),
v AS (SELECT doc_id, {votes} FROM w GROUP BY doc_id),
s AS (SELECT doc_id, {concat} AS simhash FROM v),
chunks AS (SELECT doc_id, simhash, unnest([{chunks}]) AS chunk FROM s),
capped AS (
  SELECT * FROM chunks QUALIFY count(*) OVER (PARTITION BY chunk) <= {max_bucket}),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
                  l.simhash AS sa, r.simhash AS sb
  FROM capped l JOIN capped r ON l.chunk = r.chunk AND l.doc_id < r.doc_id)
SELECT id_a, id_b, hamming FROM (
  SELECT id_a, id_b, {hamming} AS hamming FROM pairs)
WHERE hamming <= {max_hamming}
"""


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key aggregation via explicit two-stage salting (partials by
    (key, salt), then merge by key) — row-identical to the plain groupBy."""
    orders = _t(spark, sf_dir, "orders")
    out = salted_agg(
        orders, ["o_custkey"], {"o_orderkey": "count", "o_totalprice": "max"}, buckets=8
    )
    return out.select(
        "o_custkey",
        F.col("count_o_orderkey").alias("n_orders"),
        F.round("max_o_totalprice", 2).alias("max_price"),
    )


ORACLE_SALTED_AGG = """
SELECT o_custkey, count(o_orderkey) AS n_orders,
       round(max(o_totalprice), 2) AS max_price
FROM orders GROUP BY o_custkey
"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe large-x-medium equi-join: the skewed side is salted, the
    other side replicated across salt buckets; aggregate after the join."""
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(lineitem, orders, ["l_orderkey"], buckets=8)
    return joined.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_items"),
        F.sum(F.col("l_quantity").cast("long")).alias("total_qty"),
    )


ORACLE_SALTED_JOIN = """
SELECT o_orderpriority, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: fact lineitem against orders/customer with the tiny
    nation dim explicitly broadcast — revenue rollup per nation."""
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # Exact decimal arithmetic for the sum (order-independent), but the final
    # value is cast to double on BOTH sides so no engine-specific numeric type
    # (Decimal vs hugeint rendering) reaches the driver's value hasher.
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_REVENUE_BY_NATION = """
SELECT n_name,
       CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(_t(spark, sf_dir, "documents"))


ORACLE_TOKEN_STATS = rf"""
SELECT doc_id,
       len(string_split_regex(trim(text), '{WS_SQL}')) AS n_tokens,
       length(text) AS n_chars,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS approx_bpe_tokens
FROM documents
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(_t(spark, sf_dir, "documents"))


def _oracle_quality() -> str:
    from wpextract_spark.operators.textstats import _STOPWORDS_EN

    stops = ", ".join(f"'{w}'" for w in _STOPWORDS_EN)
    return rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws FROM documents),
s AS (
  SELECT doc_id,
         len(ws) AS n_tokens,
         len(list_filter(ws, x -> list_contains([{stops}], lower(x)))) AS n_stop,
         list_sum([CAST(length(x) AS DOUBLE) for x in ws]) AS total_len
  FROM w)
SELECT doc_id, n_tokens,
       round(n_stop * 1.0 / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(total_len / greatest(n_tokens, 1), 6) AS mean_word_len,
       (CASE WHEN n_tokens >= 10 AND total_len / greatest(n_tokens, 1) BETWEEN 2.0 AND 12.0
             THEN 0.5 ELSE 0.0 END
        + CASE WHEN n_stop * 1.0 / greatest(n_tokens, 1) > 0.02 THEN 0.5 ELSE 0.0 END)::DOUBLE
       AS quality
FROM s
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(_t(spark, sf_dir, "documents"), n=5)


ORACLE_FINGERPRINTS = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws FROM documents)
SELECT doc_id,
       list_aggregate(
         [md5(array_to_string(ws[i:i+4], ' '))
          for i in range(1, greatest(len(ws) - 4, 1) + 1)],
         'min') AS fingerprint
FROM w
"""


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (pandas UDF); the voting is relational,
    so the oracle restates it in SQL from the same profile dict."""
    return lang_id(_t(spark, sf_dir, "documents"))


def _oracle_lang_id() -> str:
    from wpextract_spark.operators.textstats import _LANG_PROFILES

    score_cols = []
    structs = []
    for code in sorted(_LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in sorted(_LANG_PROFILES[code]))
        score_cols.append(
            f"len(list_filter(toks, t -> list_contains([{words}], t))) AS s_{code}"
        )
        structs.append(f"{{'s': s_{code}, 'l': '{code}'}}")
    scores = ",\n         ".join(score_cols)
    struct_list = ", ".join(structs)
    greatest = ", ".join(f"s_{c}" for c in sorted(_LANG_PROFILES))
    # max by (score, lang) — struct comparison is field-order lexicographic,
    # matching the Python kernel's max(scores, key=lambda l: (scores[l], l)).
    ws = "' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)"
    return rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR trim(text, {ws}) = '' THEN NULL
              ELSE string_split_regex(trim(lower(text), {ws}), '{WS_SQL}') END AS toks
  FROM documents),
s AS (
  SELECT doc_id, toks,
         {scores}
  FROM t)
SELECT doc_id,
       CASE WHEN toks IS NULL THEN NULL
            WHEN greatest({greatest}) = 0 THEN 'und'
            ELSE list_max([{struct_list}]).l
       END AS lang_guess
FROM s
"""


def q_lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-trigram language ID (the n-gram heuristic variant); the
    oracle restates the trigram voting in SQL from the same profile dict."""
    from wpextract_spark.operators.textstats import lang_id_ngram

    return lang_id_ngram(_t(spark, sf_dir, "documents"))


def _oracle_lang_id_ngram() -> str:
    from wpextract_spark.operators.textstats import _LANG_TRIGRAMS

    score_cols = []
    structs = []
    for code in sorted(_LANG_TRIGRAMS):
        grams = ", ".join(f"'{g}'" for g in _LANG_TRIGRAMS[code])
        score_cols.append(
            f"len(list_filter(grams, g -> list_contains([{grams}], g))) AS s_{code}"
        )
        structs.append(f"{{'s': s_{code}, 'l': '{code}'}}")
    scores = ",\n         ".join(score_cols)
    struct_list = ", ".join(structs)
    greatest = ", ".join(f"s_{c}" for c in sorted(_LANG_TRIGRAMS))
    return f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN text IS NULL OR length(text) < 3 THEN NULL
              ELSE [substr(lower(text), i + 1, 3)
                    for i in range(length(text) - 2)] END AS grams
  FROM documents),
s AS (
  SELECT doc_id, grams,
         {scores}
  FROM t)
SELECT doc_id,
       CASE WHEN grams IS NULL THEN NULL
            WHEN greatest({greatest}) = 0 THEN 'und'
            ELSE list_max([{struct_list}]).l
       END AS lang_guess
FROM s
"""


def q_bpe_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex pre-tokenization counts (lookahead-free so the same
    pattern runs in Java regex and the oracle's RE2)."""
    from wpextract_spark.operators.textstats import bpe_token_stats

    return bpe_token_stats(_t(spark, sf_dir, "documents"))


def _oracle_bpe_tokens() -> str:
    from wpextract_spark.operators.textstats import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    return rf"""
WITH c AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}', 0)) AS n_bpe_tokens,
         len(string_split_regex(trim(text), '{WS_SQL}')) AS n_ws_tokens
  FROM documents)
SELECT doc_id, n_bpe_tokens, n_ws_tokens,
       round(n_bpe_tokens / greatest(n_ws_tokens, 1), 6) AS tokens_per_word
FROM c
"""


#: merge count for the oracle-checked BPE query — small enough that the
#: unrolled-CTE oracle stays readable, large enough that merges chain
#: (merged tokens re-merge with neighbors).
BPE_QUERY_MERGES = 12


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL byte-pair encoding, oracle-checked end to end: train
    BPE_QUERY_MERGES merges on the documents corpus (distributed word-freq
    aggregation -> driver merge loop, operators/bpe.py), then encode every
    document through the broadcast merge list with the Arrow UDF and emit
    per-document real token counts. The oracle restates BOTH phases in
    DuckDB — training as an unrolled chain of pair-count/argmax/replace
    CTEs (selection: max count, then lexicographically smallest pair;
    application: leftmost non-overlapping replace on a \\x1f-separated
    symbol string — bitwise the semantics of the Python trainer), encoding
    as a word-level lookup join against the trained table."""
    from wpextract_spark.operators.bpe import bpe_encode, bpe_train

    docs = _t(spark, sf_dir, "documents").where(
        F.length(F.trim(F.col("text"))) > 0
    )
    merges = bpe_train(docs, n_merges=BPE_QUERY_MERGES)
    return bpe_encode(docs, merges)


def _oracle_bpe_encode(n_merges: int = BPE_QUERY_MERGES) -> str:
    """Unrolled BPE training + encoding in pure SQL (see q_bpe_encode)."""
    levels = []
    for i in range(n_merges):
        # MATERIALIZED is load-bearing: each level references the previous
        # twice (pair counts + rewrite), so inlined CTEs would expand the
        # chain 2^n_merges times.
        levels.append(
            f"""p{i} AS MATERIALIZED (
  SELECT t[pos] AS a, t[pos + 1] AS b, sum(freq) AS c
  FROM (SELECT string_split(trim(toks, chr(31)), chr(31)) AS t, freq
        FROM w{i}),
       LATERAL unnest(generate_series(1, greatest(len(t) - 1, 0))) AS g(pos)
  GROUP BY 1, 2),
b{i} AS MATERIALIZED (SELECT a, b FROM p{i} ORDER BY c DESC, a, b LIMIT 1),
w{i + 1} AS MATERIALIZED (
  SELECT w.word,
         CASE WHEN b.a IS NULL THEN w.toks
              ELSE replace(w.toks, b.a || chr(31) || b.b, b.a || b.b)
         END AS toks,
         w.freq
  FROM w{i} w LEFT JOIN b{i} b ON TRUE)"""
        )
    unrolled = ",\n".join(levels)
    return rf"""
WITH dw AS (
  SELECT doc_id, word
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(text), '{WS_SQL}')) AS word
        FROM documents
        WHERE text IS NOT NULL AND trim(text) <> '')
  WHERE word <> ''),
wf AS (SELECT word, count(*) AS freq FROM dw GROUP BY word),
w0 AS MATERIALIZED (
  SELECT word,
         chr(31) || array_to_string(string_split_regex(word, ''), chr(31))
                 || chr(31) AS toks,
         freq
  FROM wf),
{unrolled},
enc AS (
  SELECT word,
         len(string_split(trim(toks, chr(31)), chr(31))) AS n_toks
  FROM w{n_merges})
SELECT dw.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(enc.n_toks) AS BIGINT) AS n_tokens
FROM dw JOIN enc USING (word)
GROUP BY dw.doc_id
"""


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    feats = extract_media_features(media)
    return feats.select("media_id", "kind", "n_bytes", "checksum")


ORACLE_MULTIMODAL = """
SELECT doc_id AS media_id, 'text' AS kind,
       octet_length(CAST(text AS BLOB)) AS n_bytes, md5(text) AS checksum
FROM documents
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = documents_as_media(_t(spark, sf_dir, "documents"))
    frames = frame_sample_stub(media, every_s=1.0)
    return frames.groupBy("media_id").agg(F.count("*").alias("n_frames"))


ORACLE_FRAME_SAMPLE = """
SELECT doc_id AS media_id,
       greatest(CAST(floor(length(text) / 100.0) AS BIGINT), 1) AS n_frames
FROM documents
"""


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOM-heuristics leg: locate the article body on a generic (non-WP)
    page drowned in boilerplate — nav menu, link-farm sidebar with its own
    <p> soup, footer — and extract exactly the main text. The oracle states
    the invariant: heuristic output == the embedded document text (squashed).
    Text is HTML-escaped into the page so '&'/'<'/'>' in a corpus can't
    break the embedding; the parser unescapes, the kernel squashes, and the
    oracle applies the same squash in SQL."""
    from wpextract_spark.operators.extract import main_content_udf

    docs = _t(spark, sf_dir, "documents")
    escaped = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.col("text"), "&", "&amp;"), "<", "&lt;"),
        ">",
        "&gt;",
    )
    nav = F.lit(
        "<nav><ul>"
        + "".join(f'<li><a href="/m{i}">menu item {i}</a></li>' for i in range(12))
        + "</ul></nav>"
    )
    sidebar = F.lit(
        '<div class="sidebar"><p>'
        + " ".join(f'<a href="/t{i}">tag{i} cloud word</a>' for i in range(10))
        + "</p></div>"
    )
    html = F.concat(
        F.lit("<html><body><header><h1>Site Title</h1></header>"),
        nav,
        F.lit('<div id="page"><main><article><p>'),
        escaped,
        F.lit("</p></article></main></div>"),
        sidebar,
        F.lit("<footer><p>copyright boilerplate links "),
        F.lit('<a href="/about">about</a> <a href="/contact">contact</a>'),
        F.lit("</p></footer></body></html>"),
    )
    res = main_content_udf()(html)
    return docs.select(
        "doc_id",
        res["text"].alias("main_text"),
        res["error"].isNotNull().alias("quarantined"),
    )


# squash_whitespace (functions/text.py:32) restated in SQL: collapse \n runs,
# strip line-leading whitespace (the _PY_WS_CLS class — Python's Unicode \s),
# trim ends.
ORACLE_MAIN_CONTENT = rf"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(regexp_replace(text, '\n{{2,}}', chr(10), 'g'),
                        '(?m)^[{_PY_WS_CLS}]+', '', 'g'),
         '^[{_PY_WS_CLS}]+|[{_PY_WS_CLS}]+$', '', 'g') AS main_text,
       false AS quarantined
FROM documents
"""


def q_pdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PDF leg of the extraction tier: synthesize a deterministic two-page
    PDF per document (Flate-compressed content streams), then extract its
    text with the pure-Python PDF parser. The oracle states the roundtrip
    invariant relationally: extracted text == page-1 text + newline +
    page-2 text, page count == 2."""
    from wpextract_spark.operators.extract import pdf_build_udf, pdf_text_udf

    docs = _t(spark, sf_dir, "documents")
    page2 = F.concat(
        F.lit("doc "), F.col("doc_id").cast("string"), F.lit("\nsecond line")
    )
    pdf = pdf_build_udf()(F.col("text"), page2)
    res = pdf_text_udf()(pdf)
    return docs.select(
        "doc_id",
        res["text"].alias("pdf_text"),
        res["n_pages"].alias("n_pages"),
        res["error"].isNotNull().alias("quarantined"),
    )


ORACLE_PDF_ROUNDTRIP = r"""
SELECT doc_id,
       regexp_replace(text, '[^\x00-\x{ff}]', '?', 'g')
            || chr(10) || 'doc ' || CAST(doc_id AS VARCHAR)
            || chr(10) || 'second line' AS pdf_text,
       CAST(2 AS BIGINT) AS n_pages,
       false AS quarantined
FROM documents
"""


def q_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image-metadata decode: synthesize a deterministic PNG/GIF/JPEG
    payload per document, then sniff mime/width/height from header bytes
    (kernel/imagemeta.py — no codec library). The oracle restates the
    generator's dimension arithmetic; the Spark path actually builds the
    bytes and parses them back."""
    from wpextract_spark.operators.multimodal import image_build_udf, image_metadata

    kinds = F.array(F.lit("png"), F.lit("gif"), F.lit("jpeg"))
    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.element_at(kinds, (F.col("doc_id") % 3 + 1).cast("int")).alias("kind"),
        image_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return image_metadata(media)


ORACLE_IMAGE_META = """
SELECT doc_id AS media_id,
       ['png','gif','jpeg'][(doc_id % 3) + 1] AS kind,
       'image/' || ['png','gif','jpeg'][(doc_id % 3) + 1] AS mime,
       CAST(16 + doc_id % 100 AS INTEGER) AS width,
       CAST(16 + (doc_id * 7) % 100 AS INTEGER) AS height
FROM documents
"""


def q_png_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel decode, oracle-checked: synthesize a deterministic
    gradient PNG per document (sources/imagegen.py — Sub-filtered row 0,
    Up-filtered rest), then zlib-inflate + unfilter the pixels back out
    (kernel/pngcodec.py) and emit exact integer pixel sums. The oracle
    restates the generator's pixel arithmetic ((base + r + c) % 256) with a
    double-lateral range, so a decoder bug anywhere in the filter chain
    breaks the hash."""
    from wpextract_spark.operators.multimodal import (
        gradient_image_build_udf,
        png_pixel_stats,
    )

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("png").alias("kind"),
        gradient_image_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return png_pixel_stats(media)


ORACLE_PNG_PIXELS = """
WITH d AS (
  SELECT doc_id,
         16 + doc_id % 100 AS w,
         16 + (doc_id * 7) % 100 AS h,
         (doc_id * 37) % 256 AS base
  FROM documents),
px AS (
  -- sum over the w x h grid of (base + r + c) % 256, grouped by the
  -- diagonal s = r + c: each diagonal holds
  -- least(h-1, s) - greatest(0, s - w + 1) + 1 pixels of equal value.
  -- (range() here takes a constant — this DuckDB build rejects
  -- lateral-correlated table-function parameters.)
  SELECT d.doc_id, d.w, d.h,
         CAST(sum(
           (least(d.h - 1, s.v) - greatest(0, s.v - d.w + 1) + 1)
           * ((d.base + s.v) % 256)
         ) AS BIGINT) AS pixel_sum
  FROM d JOIN range(512) s(v) ON s.v <= d.h + d.w - 2
  GROUP BY d.doc_id, d.w, d.h)
SELECT doc_id AS media_id, 'png' AS kind,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       CAST(w * h AS BIGINT) AS n_pixels, pixel_sum
FROM px
"""


def q_jpeg_pixels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline-JPEG pixel decode, oracle-checked: synthesize a
    deterministic block-gradient JPEG per document (sources/imagegen.py —
    actual DCT + Annex-K Huffman entropy coding), then Huffman-decode +
    IDCT the pixels back out (kernel/jpegcodec.py) and emit exact integer
    pixel sums. Pixels are constant per 8x8 block, so the spectrum is
    DC-only and the round-trip is bit-exact — the oracle restates the
    generator's block arithmetic ((base + r//8 + c//8) % 256) without
    modeling DCT rounding. Goes through the magic-dispatched
    image_pixel_stats so the PNG/GIF/JPEG dispatch path is the thing
    driver-checked."""
    from wpextract_spark.operators.multimodal import (
        gradient_jpeg_build_udf,
        image_pixel_stats,
    )

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("jpeg").alias("kind"),
        gradient_jpeg_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return image_pixel_stats(media)


ORACLE_JPEG_PIXELS = """
WITH d AS (
  SELECT doc_id,
         16 + doc_id % 100 AS w,
         16 + (doc_id * 7) % 100 AS h,
         (doc_id * 37) % 256 AS base
  FROM documents),
px AS (
  -- sum over the block grid: block (br, bc) holds
  -- least(8, h - 8*br) x least(8, w - 8*bc) pixels of constant value
  -- (base + br + bc) % 256. (range() takes a constant — this DuckDB build
  -- rejects lateral-correlated table-function parameters.)
  SELECT d.doc_id, d.w, d.h,
         CAST(sum(
           ((d.base + br.v + bc.v) % 256)
           * least(8, d.h - br.v * 8) * least(8, d.w - bc.v * 8)
         ) AS BIGINT) AS pixel_sum
  FROM d
  JOIN range(16) br(v) ON br.v * 8 < d.h
  JOIN range(16) bc(v) ON bc.v * 8 < d.w
  GROUP BY d.doc_id, d.w, d.h)
SELECT doc_id AS media_id, 'jpeg' AS kind,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
       CAST(1 AS INTEGER) AS channels,
       CAST(w * h AS BIGINT) AS n_pixels, pixel_sum
FROM px
"""


def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video frame sampling + decode, oracle-checked: synthesize a
    deterministic MJPEG AVI per document (sources/videogen.py — a complete
    RIFF container of block-gradient baseline JPEGs), walk the container's
    movi chunks (kernel/avicodec.py), sample every 2nd frame, and decode
    each frame's pixels (kernel/jpegcodec.py). The oracle restates the
    per-frame block arithmetic ((base + 11*f + r//8 + c//8) % 256) over the
    sampled frame indices."""
    from wpextract_spark.operators.multimodal import (
        gradient_video_build_udf,
        video_frame_stats,
    )

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        gradient_video_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return video_frame_stats(media, every_n=2)


def q_mjpeg_stream_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling + decode from the SECOND video wrapper: a raw
    MJPEG stream (concatenated JPEGs, IP-camera shape — no container at
    all; kernel/mjpegcodec.py splits by JPEG marker walk). Same
    deterministic frame arithmetic as q_video_frames' AVI generator
    (sources/videogen.py), so ORACLE_VIDEO_FRAMES restates both wrappers —
    proving the decode seam generalizes beyond one container format."""
    from wpextract_spark.operators.multimodal import (
        gradient_mjpeg_stream_build_udf,
        video_frame_stats,
    )

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        gradient_mjpeg_stream_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return video_frame_stats(media, every_n=2, container="mjpeg")


ORACLE_VIDEO_FRAMES = """
WITH d AS (
  SELECT doc_id,
         16 + doc_id % 48 AS w,
         16 + (doc_id * 7) % 48 AS h,
         2 + doc_id % 6 AS n_frames,
         (doc_id * 37) % 256 AS base
  FROM documents),
f AS (  -- every 2nd frame: indices 0, 2, 4 ... < n_frames
  SELECT d.*, fr.v AS frame_idx
  FROM d JOIN range(8) fr(v) ON fr.v % 2 = 0 AND fr.v < d.n_frames),
px AS (
  SELECT f.doc_id, f.frame_idx, f.w, f.h,
         CAST(sum(
           ((f.base + f.frame_idx * 11 + br.v + bc.v) % 256)
           * least(8, f.h - br.v * 8) * least(8, f.w - bc.v * 8)
         ) AS BIGINT) AS pixel_sum
  FROM f
  JOIN range(8) br(v) ON br.v * 8 < f.h
  JOIN range(8) bc(v) ON bc.v * 8 < f.w
  GROUP BY 1, 2, 3, 4)
SELECT doc_id AS media_id, CAST(frame_idx AS INTEGER) AS frame_idx,
       CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height, pixel_sum
FROM px
"""


def q_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio-metadata decode: synthesize a deterministic PCM WAV per
    document, sniff sample rate / channels / samples / duration from the
    RIFF headers (kernel/audiometa.py — no codec library). The oracle
    restates the generator's arithmetic."""
    from wpextract_spark.operators.multimodal import audio_build_udf, audio_metadata

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        audio_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return audio_metadata(media)


ORACLE_AUDIO_META = """
SELECT doc_id AS media_id, 'audio' AS kind, 'audio/wav' AS mime,
       CAST(8000 + (doc_id % 5) * 2000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       CAST(1000 + (doc_id * 37) % 4000 AS BIGINT) AS n_samples,
       CAST(1000 + (doc_id * 37) % 4000 AS DOUBLE)
           / (8000 + (doc_id % 5) * 2000) AS duration_s
FROM documents
"""


def q_image_ahash_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup, oracle-checked end-to-end through the REAL
    PNG decode: gradient PNG per document -> zlib inflate + unfilter ->
    8x8 nearest-neighbor average-hash -> exact-hash group sizes
    (operators/multimodal.py:image_ahash_groups). The oracle restates the
    generator's pixel arithmetic, the nearest-neighbor sample grid, and the
    integer mean-threshold bit rule."""
    from wpextract_spark.operators.multimodal import (
        gradient_image_build_udf,
        image_ahash_groups,
    )

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("png").alias("kind"),
        gradient_image_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return image_ahash_groups(media)


ORACLE_IMAGE_AHASH = """
WITH d AS (
  SELECT doc_id,
         16 + doc_id % 100 AS w,
         16 + (doc_id * 7) % 100 AS h,
         (doc_id * 37) % 256 AS base
  FROM documents),
cells AS (
  SELECT d.doc_id, r.v AS r, c.v AS c,
         (d.base + (r.v * d.h) // 8 + (c.v * d.w) // 8) % 256 AS val
  FROM d, range(8) r(v), range(8) c(v)),
tot AS (SELECT doc_id, sum(val) AS total FROM cells GROUP BY doc_id),
bits AS (
  SELECT c.doc_id,
         string_agg(CASE WHEN 64 * c.val > t.total THEN '1' ELSE '0' END,
                    '' ORDER BY c.r * 8 + c.c) AS ahash
  FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id)
SELECT doc_id AS media_id, 'png' AS kind, ahash,
       CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same
FROM bits
"""


def q_audio_pcm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PCM sample decode, oracle-checked: synthesize a deterministic
    16-bit mono PCM WAV per document (sources/audiogen.py — sample i is
    ``((i*257) % 16384) - 8192``), decode the data chunk's frames back out
    (kernel/audiocodec.py) and emit exact integer sample statistics (sum,
    energy, peak). The oracle restates the generator arithmetic over a
    range() join, so a decoder bug anywhere in the RIFF walk or the frame
    slicing breaks the hash — completes the audio half of the multimodal
    family (images went real in rounds 3-4)."""
    from wpextract_spark.operators.multimodal import audio_build_udf, audio_pcm_stats

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        audio_build_udf()(F.col("doc_id")).alias("payload"),
    )
    return audio_pcm_stats(media)


ORACLE_AUDIO_PCM = """
WITH d AS (
  SELECT doc_id, 1000 + (doc_id * 37) % 4000 AS n FROM documents),
s AS (
  SELECT d.doc_id, d.n,
         CAST(sum((i.v * 257) % 16384 - 8192) AS BIGINT) AS sum_samples,
         CAST(sum(((i.v * 257) % 16384 - 8192)
                  * ((i.v * 257) % 16384 - 8192)) AS BIGINT) AS sum_squares,
         CAST(max(abs((i.v * 257) % 16384 - 8192)) AS INTEGER) AS peak_abs
  FROM d JOIN range(4999) i(v) ON i.v < d.n
  GROUP BY d.doc_id, d.n)
SELECT doc_id AS media_id, 'audio' AS kind, CAST(n AS BIGINT) AS n_samples,
       sum_samples, sum_squares, peak_abs
FROM s
"""


def q_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion, oracle-checked end to end: each document is framed
    as a deterministic single-record Common-Crawl-style .warc.gz capture
    (sources/warcgen.py — per-record gzip members, HTTP response envelope,
    Content-Length framing), then parsed back with the real codec
    (kernel/warc.py) and reduced to exact envelope + payload statistics.
    The oracle restates the generator's construction over the documents
    table, so a bug anywhere in the gzip member split, WARC header parse,
    Content-Length body slice, or HTTP payload split breaks the hash.
    The distributed file path (binaryFile scan -> mapInPandas, cc-pyspark's
    published layout) is covered by tests/test_warc.py round-trips."""
    from wpextract_spark.sources.warc import warc_build_udf, warc_payload_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        warc_build_udf()(F.col("doc_id"), F.col("source"), F.col("text")).alias(
            "payload"
        ),
    )
    return warc_payload_stats(docs)


ORACLE_WARC_EXTRACT = """
SELECT doc_id,
       CAST(2 AS INTEGER) AS n_records,
       'https://' || source || '.example.org/doc/' || CAST(doc_id AS VARCHAR)
           AS target_uri,
       '2024-' || lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0')
           || '-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
           || 'T' || lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0')
           || ':00:00Z' AS warc_date,
       CAST(200 AS INTEGER) AS http_status,
       'text/html' AS mime,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_len,
       md5(text) AS payload_md5
FROM documents
"""


def q_pages_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full fused extraction over the deterministic synthetic pages
    table. The oracle is the page builder's own statement of intent: synth
    pages embed known text/spans by construction (sources/synth.py emits
    expected_* fields without running the kernel), inlined as a VALUES table.
    Text is compared via md5 so the oracle SQL stays compact."""
    from wpextract_spark.sources.synth import generate_pages

    pages = generate_pages(spark, n_pages=300, seed=42)
    res = content_extract_udf()(F.col("html"), F.col("url"))
    return pages.select(
        "url",
        "lang",
        F.md5(res["text"]).alias("text_md5"),
        F.size(res["links_internal"]).alias("n_internal"),
        F.size(res["links_external"]).alias("n_external"),
        F.size(res["images"]).alias("n_images"),
        F.size(res["embeds"]).alias("n_embeds"),
    )


def _oracle_pages_extract(n_pages: int = 300, seed: int = 42) -> str:
    import hashlib as _hashlib

    from wpextract_spark.sources.synth import synth_page

    rows = []
    for doc_id in range(n_pages):
        p = synth_page(doc_id, seed, with_expected=True)
        text_md5 = _hashlib.md5(p["expected_text"].encode("utf-8")).hexdigest()
        rows.append(
            f"('{p['url']}', '{p['lang']}', '{text_md5}', "
            f"{p['expected_n_internal']}, {p['expected_n_external']}, "
            f"{p['expected_n_images']}, {p['expected_n_embeds']})"
        )
    values = ",\n".join(rows)
    return f"""
SELECT url, lang, text_md5,
       CAST(n_internal AS INTEGER) AS n_internal,
       CAST(n_external AS INTEGER) AS n_external,
       CAST(n_images AS INTEGER) AS n_images,
       CAST(n_embeds AS INTEGER) AS n_embeds
FROM (VALUES
{values}
) AS t(url, lang, text_md5, n_internal, n_external, n_images, n_embeds)
"""


# ---------------------------------------------------------------------------
# Corpus-curation filters (Gopher/C4/CCNet-style training-data passes)
# ---------------------------------------------------------------------------


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def _oracle_repetition_stats() -> str:
    # Mirrors repetition_stats(ns=(2, 3)): the top gram per n is max by
    # (count, gram) — DuckDB struct comparison is field-order lexicographic,
    # matching Spark's max(struct(c, gram)).
    return rf"""
WITH w AS (
  SELECT doc_id, length(text) AS n_chars,
         string_split_regex(trim(text), '{WS_SQL}') AS ws
  FROM documents),
b AS (
  SELECT doc_id, n_chars, len(ws) AS n_words,
         len(list_distinct(ws)) AS n_distinct,
         [array_to_string(ws[i:i+1], ' ')
          for i in range(1, greatest(len(ws) - 1, 0) + 1)] AS g2,
         [array_to_string(ws[i:i+2], ' ')
          for i in range(1, greatest(len(ws) - 2, 0) + 1)] AS g3
  FROM w),
c2 AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(g2) AS gram FROM b) GROUP BY doc_id, gram),
t2 AS (SELECT doc_id, max({{'c': c, 'gram': gram}}) AS m FROM c2 GROUP BY doc_id),
c3 AS (
  SELECT doc_id, gram, count(*) AS c
  FROM (SELECT doc_id, unnest(g3) AS gram FROM b) GROUP BY doc_id, gram),
t3 AS (SELECT doc_id, max({{'c': c, 'gram': gram}}) AS m FROM c3 GROUP BY doc_id)
SELECT b.doc_id, b.n_words,
       round((b.n_words - b.n_distinct) * 1.0 / greatest(b.n_words, 1), 6)
         AS dup_word_frac,
       round(coalesce(t2.m.c * length(t2.m.gram) * 1.0
                      / greatest(b.n_chars, 1), 0.0), 6) AS top2_gram_char_frac,
       round(coalesce(t3.m.c * length(t3.m.gram) * 1.0
                      / greatest(b.n_chars, 1), 0.0), 6) AS top3_gram_char_frac
FROM b LEFT JOIN t2 USING (doc_id) LEFT JOIN t3 USING (doc_id)
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import gopher_quality_flags

    return gopher_quality_flags(_t(spark, sf_dir, "documents"))


def _oracle_gopher_quality() -> str:
    from wpextract_spark.operators.corpusfilters import (
        GOPHER_MAX_MEAN_WORD_LEN,
        GOPHER_MAX_SYMBOL_RATIO,
        GOPHER_MAX_WORDS,
        GOPHER_MIN_ALPHA_FRAC,
        GOPHER_MIN_MEAN_WORD_LEN,
        GOPHER_MIN_WORDS,
    )

    return rf"""
WITH w AS (
  SELECT doc_id, text,
         string_split_regex(trim(text), '{WS_SQL}') AS ws,
         length(regexp_replace(trim(text), '{WS_SQL}', '', 'g')) AS twc
  FROM documents),
s AS (
  SELECT doc_id,
         len(ws) AS n_words,
         twc * 1.0 / greatest(len(ws), 1) AS mean_len,
         len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) * 1.0
           / greatest(len(ws), 1) AS alpha_frac,
         (len(string_split(text, '#')) - 1
          + len(string_split_regex(text, '\.\.\.')) - 1) * 1.0
           / greatest(len(ws), 1) AS symbol_ratio
  FROM w)
SELECT doc_id, n_words,
       round(mean_len, 6) AS mean_word_len,
       round(alpha_frac, 6) AS alpha_word_frac,
       round(symbol_ratio, 6) AS symbol_ratio,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
        AND mean_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN} AND {GOPHER_MAX_MEAN_WORD_LEN}
        AND alpha_frac >= {GOPHER_MIN_ALPHA_FRAC}
        AND symbol_ratio <= {GOPHER_MAX_SYMBOL_RATIO}) AS keep
FROM s
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import line_dedup

    return line_dedup(_t(spark, sf_dir, "documents"))


ORACLE_LINE_DEDUP = """
WITH l AS (
  SELECT doc_id, generate_subscripts(ls, 1) AS pos, unnest(ls) AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents)),
n AS (SELECT lower(trim(line)) AS norm, count(*) AS cnt FROM l GROUP BY 1),
k AS (
  SELECT doc_id,
         array_to_string(list(line ORDER BY pos), chr(10)) AS text_clean,
         count(*) AS n_kept
  FROM l JOIN n ON lower(trim(l.line)) = n.norm
  WHERE n.cnt < 2
  GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(k.text_clean, '') AS text_clean,
       len(string_split(d.text, chr(10))) AS n_lines,
       coalesce(k.n_kept, 0) AS n_kept
FROM documents d LEFT JOIN k USING (doc_id)
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import pii_scrub

    return pii_scrub(_t(spark, sf_dir, "documents"))


def _oracle_pii_scrub() -> str:
    # The patterns are spelled backreference/lookaround-free so Java regex
    # (Spark) and RE2 (DuckDB) match identically; counts are taken on the
    # text as each pattern sees it (sequential scrub), same as the operator.
    from wpextract_spark.operators.corpusfilters import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    return f"""
WITH t AS (
  SELECT doc_id, text AS t0,
         regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM documents),
u AS (
  SELECT doc_id, t0, t1,
         regexp_replace(t1, '{PII_IPV4}', '<IP>', 'g') AS t2
  FROM t)
SELECT doc_id,
       regexp_replace(t2, '{PII_PHONE}', '<PHONE>', 'g') AS text_scrubbed,
       len(regexp_extract_all(t0, '{PII_EMAIL}')) AS n_emails,
       len(regexp_extract_all(t1, '{PII_IPV4}')) AS n_ips,
       len(regexp_extract_all(t2, '{PII_PHONE}')) AS n_phones
FROM u
"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level distributed prefix sum for training-sequence packing
    (bucket_width=64 exercises multiple buckets at sf0.01's 500 docs)."""
    from wpextract_spark.operators.packing import sequence_pack

    return sequence_pack(
        _t(spark, sf_dir, "documents"), seq_len=512, bucket_width=64
    )


def _oracle_sequence_pack() -> str:
    # The oracle IS the naive single-window cumsum the operator decomposes:
    # identical results, different physical plan.
    from wpextract_spark.operators.textstats import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    return rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}', 0)) + 1 AS n_tokens
  FROM documents),
o AS (
  SELECT doc_id, n_tokens,
         -- window sum(int) is HUGEINT in DuckDB — cast before it propagates
         -- into the derived // columns (same class as ORACLE_SESSIONIZE).
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS "offset"
  FROM t)
SELECT doc_id, n_tokens, "offset",
       "offset" // 512 AS seq_index,
       ("offset" + n_tokens - 1) // 512 - "offset" // 512 + 1 AS n_seqs_spanned
FROM o
"""


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized packed training sequences (512-token windows over the
    corpus token stream; same knobs as q_sequence_pack)."""
    from wpextract_spark.operators.packing import pack_sequences

    return pack_sequences(
        _t(spark, sf_dir, "documents"), seq_len=512, bucket_width=64
    )


def _oracle_pack_sequences() -> str:
    from wpextract_spark.operators.textstats import BPE_SPLIT_RE

    pat = BPE_SPLIT_RE.replace("'", "''")
    return rf"""
WITH t AS (
  SELECT doc_id,
         list_concat(regexp_extract_all(text, '{pat}', 0), ['<|eos|>']) AS ts
  FROM documents),
o AS (
  SELECT doc_id, ts, len(ts) AS n_tokens,
         CAST(coalesce(sum(len(ts)) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS off
  FROM t),
p AS (
  SELECT seq, greatest(off, seq * 512) AS gstart,
         least(off + n_tokens, (seq + 1) * 512) AS gend, off, ts
  FROM o,
       LATERAL unnest(generate_series(off // 512,
                                      (off + n_tokens - 1) // 512)) AS g(seq)),
placed AS (
  SELECT seq, gstart - seq * 512 AS pos,
         list_slice(ts, CAST(gstart - off + 1 AS BIGINT),
                    CAST(gend - off AS BIGINT)) AS piece
  FROM p)
SELECT seq AS seq_id,
       array_to_string(flatten(list(piece ORDER BY pos)), ' ') AS text,
       len(flatten(list(piece ORDER BY pos))) AS n_tokens,
       count(*) AS n_docs
FROM placed GROUP BY seq
"""


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup over deterministically-messy URLs: consecutive
    doc pairs share a page behind different surface forms (case, default
    port, trailing slash, tracking params, fragment)."""
    from wpextract_spark.operators.corpusfilters import url_dedup

    docs = _t(spark, sf_dir, "documents")
    base = F.floor(F.col("doc_id") / 2).cast("long").cast("string")
    url = F.when(
        F.col("doc_id") % 2 == 0,
        F.concat(
            F.lit("https://Example.org/post/"), base, F.lit("/?id="), base,
            F.lit("&utm_source=feed#top"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://example.org:443/post/"), base, F.lit("?id="), base
        )
    )
    return url_dedup(docs.select("doc_id", url.alias("url")))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl snapshot delta (operators/snapshot.py): documents is the old
    snapshot; the new snapshot derives deterministically — docs with
    doc_id % 13 == 0 vanish (removed), % 7 == 0 get edited text (changed),
    and a shifted-id cohort appears (added). One full-outer join on
    uniform ids moving only (id, md5) pairs. The oracle restates the same
    derivation and join."""
    from wpextract_spark.operators.snapshot import snapshot_diff

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    new = docs.where(F.col("doc_id") % 13 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [edited]"))
        ).otherwise(F.col("text")).alias("text"),
    ).unionAll(
        docs.where(F.col("doc_id") % 11 == 0).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    return snapshot_diff(docs, new, id_col="doc_id")


ORACLE_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT doc_id, md5(text) AS old_fp FROM documents),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]' ELSE text END)
           AS new_fp
  FROM documents WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, md5(text) AS new_fp
  FROM documents WHERE doc_id % 11 = 0)
SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id, old_fp, new_fp,
       CASE WHEN old_fp IS NULL THEN 'added'
            WHEN new_fp IS NULL THEN 'removed'
            WHEN old_fp <> new_fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
"""


def q_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing (operators/sampling.py:source_mix):
    per-source keep rates min(1, budget/total_words) realized through the
    md5-threshold rule with EXACT integer thresholds (budget * 2^32 //
    total) so Spark and the oracle compare bit-identical hex strings.
    Budgets exercise all regimes: partial rate (src0), keep-all sentinel
    (src1), zero (src2), and a default for every other source."""
    from wpextract_spark.operators.sampling import source_mix

    return source_mix(
        _t(spark, sf_dir, "documents"),
        budgets={"src0": 1500, "src1": 10_000_000, "src2": 0},
        default_budget=800,
        salt="mix",
    )


ORACLE_SOURCE_MIX = rf"""
WITH w AS (
  SELECT doc_id, source,
         len(string_split_regex(trim(text), '{WS_SQL}')) AS n_words
  FROM documents),
t AS (
  SELECT source, sum(n_words) AS total FROM w GROUP BY source),
r AS (
  SELECT source, total,
         CASE WHEN source = 'src0' THEN 1500
              WHEN source = 'src1' THEN 10000000
              WHEN source = 'src2' THEN 0
              ELSE 800 END AS budget
  FROM t),
k AS (
  SELECT source,
         CASE WHEN budget >= total THEN 'g'
              WHEN budget <= 0 THEN ''
              ELSE printf('%08x',
                     CAST(CAST(budget AS HUGEINT) * 4294967296 // total
                          AS BIGINT))
         END AS rate_key
  FROM r)
SELECT w.doc_id, w.source, CAST(w.n_words AS INTEGER) AS n_words,
       k.rate_key,
       substr(md5('mix:' || CAST(w.doc_id AS VARCHAR)), 1, 8) < k.rate_key
         AS selected
FROM w JOIN k USING (source)
"""


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping word-window chunking with provenance offsets
    (operators/chunking.py): 32-word windows, 8-word overlap, zero-shuffle
    row-local explode. The oracle restates the window formula over a
    range() join with DuckDB list slicing."""
    from wpextract_spark.operators.chunking import chunk_documents

    return chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, overlap=8
    )


ORACLE_CHUNK_DOCUMENTS = rf"""
WITH w AS (
  SELECT doc_id, string_split_regex(trim(text), '{WS_SQL}') AS ws
  FROM documents),
c AS (
  SELECT doc_id, ws,
         1 + (greatest(len(ws) - 32, 0) + 23) // 24 AS n_chunks
  FROM w)
SELECT doc_id,
       CAST(i.v AS INTEGER) AS chunk_id,
       CAST(i.v * 24 AS INTEGER) AS start_word,
       CAST(len(ws[i.v * 24 + 1 : i.v * 24 + 32]) AS INTEGER) AS n_words,
       array_to_string(ws[i.v * 24 + 1 : i.v * 24 + 32], ' ') AS chunk_text
FROM c JOIN range(100000) i(v) ON i.v < n_chunks
"""


def q_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RefinedWeb-style URL curation (operators/corpusfilters.py:url_filter):
    domain blocklist with subdomain coverage via the suffix-chain trick
    (exact set membership instead of an endswith join) + a weighted
    banned-word score over the lowercased URL. URLs are derived
    deterministically so some docs land on blocked (sub)domains and some
    carry scoring words; the oracle restates the suffix chain, the literal
    word weights, and the keep rule."""
    from wpextract_spark.operators.corpusfilters import url_filter

    docs = _t(spark, sf_dir, "documents")
    host = F.concat(
        F.when(F.col("doc_id") % 5 == 0, F.lit("ads.")).otherwise(F.lit("www.")),
        F.col("source"),
        F.lit(".example.org"),
    )
    path = (
        F.when(F.col("doc_id") % 7 == 0, F.lit("free-download/offer-"))
        .when(F.col("doc_id") % 11 == 0, F.lit("casino/room-"))
        .otherwise(F.lit("articles/post-"))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/"), path, F.col("doc_id"))
    return url_filter(
        docs.select("doc_id", url.alias("url")),
        ["ads.src1.example.org", "src2.example.org"],
    )


ORACLE_URL_FILTER = """
WITH u AS (
  SELECT doc_id,
         'https://'
           || (CASE WHEN doc_id % 5 = 0 THEN 'ads.' ELSE 'www.' END)
           || source || '.example.org/'
           || (CASE WHEN doc_id % 7 = 0 THEN 'free-download/offer-'
                    WHEN doc_id % 11 = 0 THEN 'casino/room-'
                    ELSE 'articles/post-' END)
           || CAST(doc_id AS VARCHAR) AS url
  FROM documents),
d AS (
  SELECT doc_id, url,
         regexp_extract(lower(url), '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1)
           AS domain
  FROM u),
s AS (
  SELECT doc_id, url, domain,
         string_split(domain, '.') AS labels,
         CAST(round(
                 (CASE WHEN contains(lower(url), 'casino') THEN 1.0 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), 'lottery') THEN 1.0 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), '-pills-') THEN 1.0 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), 'free-download') THEN 0.5 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), 'click-here') THEN 0.5 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), 'winner') THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN contains(lower(url), 'deal-of-the-day') THEN 0.25 ELSE 0.0 END)
           , 2) AS DOUBLE) AS url_score
  FROM d),
b AS (
  SELECT doc_id, url, domain, url_score,
         len(list_intersect(
           [array_to_string(labels[i+1:], '.') for i in range(len(labels))],
           ['ads.src1.example.org', 'src2.example.org'])) > 0 AS domain_blocked
  FROM s)
SELECT doc_id, url, domain, domain_blocked, url_score,
       (NOT domain_blocked AND url_score < 1.0) AS keep
FROM b
"""


#: The oracle restates the full canonicalization pipeline step by step —
#: fragment strip, prefix lowering, default-port drop, path/query split,
#: trailing slash, tracking-param filter + sort — not just the constructed
#: expectation, so the check covers the expressions, not the test data.
ORACLE_URL_DEDUP = r"""
WITH urls AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
           THEN 'https://Example.org/post/' || (doc_id // 2) || '/?id=' || (doc_id // 2) || '&utm_source=feed#top'
           ELSE 'https://example.org:443/post/' || (doc_id // 2) || '?id=' || (doc_id // 2)
         END AS url
  FROM documents),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u FROM urls),
s2 AS (
  SELECT doc_id, url, u,
         lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1)) AS prefix
  FROM s1),
s3 AS (
  SELECT doc_id, url,
         CASE WHEN starts_with(prefix, 'https://') AND ends_with(prefix, ':443')
                THEN prefix[1:length(prefix)-4]
              WHEN starts_with(prefix, 'http://') AND ends_with(prefix, ':80')
                THEN prefix[1:length(prefix)-3]
              ELSE prefix END AS prefix,
         u[length(prefix)+1:] AS rest
  FROM s2),
s4 AS (
  SELECT doc_id, url, prefix,
         CASE WHEN strpos(rest, '?') > 0 THEN rest[1:strpos(rest, '?')-1] ELSE rest END AS path,
         CASE WHEN strpos(rest, '?') > 0 THEN rest[strpos(rest, '?')+1:] ELSE '' END AS query
  FROM s3),
s5 AS (
  SELECT doc_id, url, prefix,
         CASE WHEN length(path) > 1 AND ends_with(path, '/')
              THEN path[1:length(path)-1] ELSE path END AS path,
         list_sort(list_filter(string_split(query, '&'),
           p -> p != '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$'))) AS params
  FROM s4),
c AS (
  SELECT doc_id, url,
         prefix || path ||
         CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&') ELSE '' END AS canon_url
  FROM s5)
SELECT doc_id, url, canon_url,
       doc_id = min(doc_id) OVER (PARTITION BY canon_url) AS keep
FROM c
"""


def q_c4_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import c4_line_filter

    return c4_line_filter(_t(spark, sf_dir, "documents"))


def _oracle_c4_filter() -> str:
    from wpextract_spark.operators.corpusfilters import (
        C4_MIN_KEPT_LINES,
        C4_MIN_WORDS_PER_LINE,
        C4_TERMINAL_RE,
    )

    return rf"""
WITH s AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
                     l -> regexp_matches(trim(l), '{C4_TERMINAL_RE}')
                          AND len(string_split_regex(trim(l), '{WS_SQL}'))
                              >= {C4_MIN_WORDS_PER_LINE}
                          AND NOT contains(lower(l), 'javascript')) AS kept
  FROM documents)
SELECT doc_id,
       coalesce(array_to_string(kept, chr(10)), '') AS text_clean,
       len(string_split(text, chr(10))) AS n_lines,
       len(kept) AS n_kept,
       (NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')
        AND len(kept) >= {C4_MIN_KEPT_LINES}) AS keep
FROM s
"""


def q_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.corpusfilters import source_cap

    return source_cap(_t(spark, sf_dir, "documents"), max_per_source=10)


ORACLE_SOURCE_CAP = """
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rank_in_source,
       row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 10 AS keep
FROM documents
"""


#: Benchmark text for q_decontaminate: a 19-token window starting at token 4
#: of every 50th document — overlapping 13-grams exist by construction, and
#: the same slice is restated verbatim in the oracle.
_DECONTAM_N = 13
_DECONTAM_SLICE_START = 4
_DECONTAM_SLICE_LEN = _DECONTAM_N + 6


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag corpus docs sharing any 13-gram with a
    benchmark synthesised from every 50th document's token window."""
    from wpextract_spark.operators.decontam import _tokens, ngram_decontaminate

    docs = _t(spark, sf_dir, "documents")
    benchmark = docs.where(F.col("doc_id") % 50 == 0).select(
        F.array_join(
            F.slice(_tokens("text"), _DECONTAM_SLICE_START, _DECONTAM_SLICE_LEN),
            " ",
        ).alias("text")
    )
    return ngram_decontaminate(docs, benchmark, n=_DECONTAM_N)


def _oracle_decontaminate() -> str:
    from wpextract_spark.operators.dedup import WS

    n, st = _DECONTAM_N, _DECONTAM_SLICE_START
    end = st + _DECONTAM_SLICE_LEN - 1
    return rf"""
WITH bdoc AS (
  SELECT array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '{WS}'), {st}, {end}), ' ')
         AS btext
  FROM documents WHERE doc_id % 50 = 0),
bg AS (
  SELECT DISTINCT array_to_string(list_slice(ts, pos, pos + {n - 1}), ' ') AS gram
  FROM (SELECT string_split_regex(trim(lower(btext)), '{WS}') AS ts FROM bdoc),
       LATERAL unnest(generate_series(1, greatest(len(ts) - {n - 1}, 0))) AS g(pos)),
dg AS (
  SELECT doc_id, array_to_string(list_slice(ts, pos, pos + {n - 1}), ' ') AS gram
  FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '{WS}') AS ts
        FROM documents),
       LATERAL unnest(generate_series(1, greatest(len(ts) - {n - 1}, 0))) AS g(pos)),
hits AS (SELECT doc_id, count(*) AS n FROM dg JOIN bg USING (gram) GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(hits.n, 0) AS n_contaminated_grams,
       coalesce(hits.n, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits USING (doc_id)
"""


_SAMPLE_RATES = {"en": 0.5, "de": 0.3, "zh": 0.0}
_SAMPLE_DEFAULT = 0.1
_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.sampling import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        strata_col="lang",
        rates=_SAMPLE_RATES,
        default_rate=_SAMPLE_DEFAULT,
    ).select("doc_id", "lang")


def _oracle_stratified_sample() -> str:
    from wpextract_spark.operators.sampling import _rate_to_hex

    cases = " ".join(
        f"WHEN '{s}' THEN '{_rate_to_hex(r)}'"
        for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8)
      < CASE lang {cases} ELSE '{_rate_to_hex(_SAMPLE_DEFAULT)}' END
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from wpextract_spark.operators.sampling import hash_split

    return hash_split(
        _t(spark, sf_dir, "documents"), weights=_SPLIT_WEIGHTS
    ).select("doc_id", "split")


def _oracle_hash_split() -> str:
    from wpextract_spark.operators.sampling import _rate_to_hex

    labels = list(_SPLIT_WEIGHTS)
    cum, whens = 0.0, []
    for label in labels[:-1]:
        cum += _SPLIT_WEIGHTS[label]
        whens.append(f"WHEN key < '{_rate_to_hex(cum)}' THEN '{label}'")
    return f"""
SELECT doc_id, CASE {' '.join(whens)} ELSE '{labels[-1]}' END AS split
FROM (SELECT doc_id, substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS key
      FROM documents)
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idempotent-ingest dedup: every 3rd document is 'already ingested';
    the bloom prefilter prunes, the anti-join exactifies."""
    from wpextract_spark.operators.dedup import incremental_dedup

    docs = _t(spark, sf_dir, "documents")
    seen = docs.where(F.col("doc_id") % 3 == 0).select("text")
    return incremental_dedup(
        docs, seen, expected_seen=200, fpp=0.05
    ).select("doc_id")


ORACLE_INCREMENTAL_DEDUP = """
SELECT d.doc_id FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM documents s
  WHERE s.doc_id % 3 = 0 AND md5(s.text) = md5(d.text))
"""


def q_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-200 corpus vocabulary with term and document frequencies."""
    from wpextract_spark.operators.textstats import vocab_build

    return vocab_build(
        _t(spark, sf_dir, "documents"), min_count=2, top_k=200
    )


ORACLE_VOCAB_BUILD = rf"""
WITH w AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(text), '{WS_SQL}')) AS token
  FROM documents)
SELECT token, count(*) AS term_count, count(DISTINCT doc_id) AS doc_freq
FROM w GROUP BY token HAVING count(*) >= 2
ORDER BY term_count DESC, token LIMIT 200
"""


def q_tfidf_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse hashed TF-IDF rows (dim=256, min_df=2)."""
    from wpextract_spark.operators.vectorize import tfidf_vectors

    return tfidf_vectors(
        _t(spark, sf_dir, "documents"), dim=256, min_df=2
    )


ORACLE_TFIDF = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(trim(lower(text)), '{WS_SQL}')) AS token
  FROM documents),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT token, count(DISTINCT doc_id) AS df FROM tok
       GROUP BY token HAVING count(DISTINCT doc_id) >= 2),
n AS (SELECT count(*) AS n FROM documents)
SELECT doc_id,
       ('0x' || substr(md5(token), 1, 8))::BIGINT % 256 AS bucket,
       round(sum(tf * (ln((n + 1.0) / (df + 1.0)) + 1)), 6) AS weight
FROM tf JOIN df USING (token) CROSS JOIN n
GROUP BY 1, 2
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus shape (exact percentiles — bit-identical to
    DuckDB's quantile_cont; approx_percentile is the 100 TB path)."""
    from wpextract_spark.operators.textstats import corpus_profile

    return corpus_profile(_t(spark, sf_dir, "documents"), group_col="lang")


ORACLE_CORPUS_PROFILE = rf"""
WITH t AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(text), '{WS_SQL}')) AS BIGINT) AS nt
  FROM documents)
SELECT lang,
       count(*) AS n_docs,
       CAST(sum(nt) AS BIGINT) AS total_tokens,
       round(avg(nt), 6) AS mean_tokens,
       round(quantile_cont(nt, 0.5), 6) AS p50_tokens,
       round(quantile_cont(nt, 0.95), 6) AS p95_tokens,
       max(nt) AS max_tokens
FROM t GROUP BY lang
"""


_PR_ITER = 3
_PR_DAMPING = 0.85


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over a derived link graph (lineitem-keyed, includes dangling
    nodes: dst space % 97 vs src space % 100)."""
    from wpextract_spark.operators.graphrank import pagerank

    lineitem = _t(spark, sf_dir, "lineitem")
    edges = lineitem.select(
        (F.col("l_orderkey") % 100).alias("src"),
        (F.col("l_partkey") % 97).alias("dst"),
    ).where(F.col("src") != F.col("dst"))
    ranks = pagerank(edges, n_iter=_PR_ITER, damping=_PR_DAMPING)
    return ranks.select("node", F.round("rank", 6).alias("rank"))


def _oracle_pagerank() -> str:
    """Unrolled fixed-iteration PageRank: the same update rule as the
    operator, one CTE block per iteration, doubles throughout (DuckDB's
    bare decimals would otherwise change the arithmetic)."""
    d = _PR_DAMPING
    blocks = [
        """
WITH e AS (
  SELECT DISTINCT l_orderkey % 100 AS src, l_partkey % 97 AS dst
  FROM lineitem WHERE l_orderkey % 100 <> l_partkey % 97),
nodes AS (SELECT DISTINCT node
          FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY src),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank
       FROM nodes)"""
    ]
    for i in range(1, _PR_ITER + 1):
        p = i - 1
        blocks.append(f"""
c{i} AS (SELECT e.dst, sum(r{p}.rank / deg.out_deg) AS in_sum
        FROM e JOIN r{p} ON e.src = r{p}.node JOIN deg ON e.src = deg.src
        GROUP BY e.dst),
d{i} AS (SELECT coalesce(sum(rank), CAST(0 AS DOUBLE)) AS dang
        FROM r{p} WHERE node NOT IN (SELECT src FROM deg)),
r{i} AS (SELECT n.node,
              CAST({1.0 - d!r} AS DOUBLE) / (SELECT n FROM nn)
              + CAST({d!r} AS DOUBLE)
                * (coalesce(c{i}.in_sum, CAST(0 AS DOUBLE))
                   + (SELECT dang FROM d{i}) / (SELECT n FROM nn)) AS rank
        FROM nodes n LEFT JOIN c{i} ON n.node = c{i}.dst)""")
    return (
        ",".join(blocks)
        + f"\nSELECT node, round(rank, 6) AS rank FROM r{_PR_ITER}"
    )


def q_span_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document verbatim-span duplication (13-token spans, gram
    document-frequency capped at 50)."""
    from wpextract_spark.operators.dedup import span_dup_pairs

    return span_dup_pairs(
        _t(spark, sf_dir, "documents"), n=13, max_gram_docs=50
    )


def _oracle_span_dups() -> str:
    from wpextract_spark.operators.dedup import WS

    return rf"""
WITH g0 AS (
  SELECT doc_id, md5(gram) AS gram FROM (
    SELECT DISTINCT doc_id,
           array_to_string(list_slice(ts, pos, pos + 12), ' ') AS gram
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '{WS}') AS ts
          FROM documents),
         LATERAL unnest(generate_series(1, greatest(len(ts) - 12, 0))) AS g(pos))),
f AS (SELECT gram FROM g0 GROUP BY gram HAVING count(*) <= 50),
gg AS (SELECT g0.doc_id, g0.gram FROM g0 JOIN f USING (gram))
SELECT l.doc_id AS id_a, r.doc_id AS id_b, count(*) AS n_shared_spans
FROM gg l JOIN gg r ON l.gram = r.gram AND l.doc_id < r.doc_id
GROUP BY 1, 2
"""


def q_surt_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURT canonical crawl-index keys (functions/urls.py::surt_key):
    quadruplets of documents share one page behind four surface forms
    (www + mixed-case path + fragment + tracking params / explicit
    default ports / trailing slash / reordered params), and the SURT key
    collapses the query-carrying variants while keeping the query-less
    one distinct. The oracle restates canonicalization AND the SURT
    transform (host reversal, www strip, rest-of-URL casefold) in SQL."""
    from wpextract_spark.functions.urls import surt_key

    docs = _t(spark, sf_dir, "documents")
    base = F.floor(F.col("doc_id") / 4).cast("long")
    k = (base % 20).cast("string")
    b = base.cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(
            v == 0,
            F.concat(
                F.lit("https://WWW.site"), k, F.lit(".example.org/Post/"),
                b, F.lit("/?b=2&utm_source=feed&a=1#top"),
            ),
        )
        .when(
            v == 1,
            F.concat(
                F.lit("http://site"), k, F.lit(".example.org:80/Post/"),
                b, F.lit("?a=1&b=2"),
            ),
        )
        .when(
            v == 2,
            F.concat(
                F.lit("https://site"), k, F.lit(".example.org:443/post/"),
                b, F.lit("/"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"), k, F.lit(".example.org/post/"),
                b, F.lit("?b=2&a=1&ref=feed"),
            ),
        )
    )
    urls = docs.select("doc_id", url.alias("url"))
    return urls.select("doc_id", "url", surt_key("url").alias("surt"))


ORACLE_SURT_KEYS = r"""
WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://WWW.site' || ((doc_id // 4) % 20) ||
                       '.example.org/Post/' || (doc_id // 4) ||
                       '/?b=2&utm_source=feed&a=1#top'
           WHEN 1 THEN 'http://site' || ((doc_id // 4) % 20) ||
                       '.example.org:80/Post/' || (doc_id // 4) || '?a=1&b=2'
           WHEN 2 THEN 'https://site' || ((doc_id // 4) % 20) ||
                       '.example.org:443/post/' || (doc_id // 4) || '/'
           ELSE 'https://site' || ((doc_id // 4) % 20) ||
                '.example.org/post/' || (doc_id // 4) || '?b=2&a=1&ref=feed'
         END AS url
  FROM documents),
s1 AS (SELECT doc_id, url, regexp_replace(url, '#.*', '') AS u FROM raw),
s2 AS (
  SELECT doc_id, url, u,
         lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)', 1))
           AS prefix
  FROM s1),
s3 AS (
  SELECT doc_id, url,
         CASE WHEN starts_with(prefix, 'https://') AND ends_with(prefix, ':443')
                THEN prefix[1:length(prefix)-4]
              WHEN starts_with(prefix, 'http://') AND ends_with(prefix, ':80')
                THEN prefix[1:length(prefix)-3]
              ELSE prefix END AS prefix,
         u[length(prefix)+1:] AS rest
  FROM s2),
s4 AS (
  SELECT doc_id, url, prefix,
         CASE WHEN strpos(rest, '?') > 0 THEN rest[1:strpos(rest, '?')-1]
              ELSE rest END AS path,
         CASE WHEN strpos(rest, '?') > 0 THEN rest[strpos(rest, '?')+1:]
              ELSE '' END AS query
  FROM s3),
s5 AS (
  SELECT doc_id, url, prefix,
         CASE WHEN length(path) > 1 AND ends_with(path, '/')
              THEN path[1:length(path)-1] ELSE path END AS path,
         list_sort(list_filter(string_split(query, '&'),
           p -> p != '' AND NOT regexp_matches(p, '^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$')))
           AS params
  FROM s4),
c AS (
  SELECT doc_id, url,
         prefix || path ||
         CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
              ELSE '' END AS canon
  FROM s5),
t1 AS (
  SELECT doc_id, url, canon,
         regexp_extract(canon, '^([a-z][a-z0-9+.-]*://[^/?#]*)', 1) AS prefix
  FROM c),
t2 AS (
  SELECT doc_id, url,
         regexp_extract(prefix, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1)
           AS hostport,
         CASE WHEN canon[length(prefix)+1:] = '' THEN '/'
              ELSE lower(canon[length(prefix)+1:]) END AS rest
  FROM t1),
t3 AS (
  SELECT doc_id, url, rest,
         regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
         regexp_replace(regexp_replace(hostport, ':[0-9]+$', ''),
                        '^www[0-9]*\.', '') AS host
  FROM t2)
SELECT doc_id, url,
       array_to_string(list_reverse(string_split(host, '.')), ',') ||
       CASE WHEN port <> '' THEN ':' || port ELSE '' END || ')' || rest
         AS surt
FROM t3
"""


def q_url_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection (operators/traps.py): a calendar host whose
    every URL is one date template, a shop host minting md5 session-id
    paths (hex-run mask), and three healthy sites whose busiest template
    (/post/{N}) dominates its host but stays under the absolute URL
    budget — exercising both halves of the AND. The oracle restates the
    masking regexes and the integer cross-multiplied flag."""
    from wpextract_spark.operators.traps import url_trap_signals

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit("https://cal.example.org/events/"),
                (d % 20 + 2000).cast("string"), F.lit("/"),
                (d % 12 + 1).cast("string"), F.lit("/"), d.cast("string"),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit("https://shop.example.org/session/"),
                F.md5(d.cast("string")),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://site"), (d % 3).cast("string"),
                F.lit(".example.org"),
                F.when(d % 5 == 0, F.lit("/about"))
                .when(d % 5 == 1, F.lit("/contact"))
                .when(d % 5 == 2, F.concat(F.lit("/post/"), d.cast("string")))
                .when(
                    d % 5 == 3,
                    F.concat(F.lit("/tag/t"), (d % 7).cast("string")),
                )
                .otherwise(F.lit("/")),
            )
        )
    )
    return url_trap_signals(docs.select(url.alias("url")))


ORACLE_URL_TRAPS = r"""
WITH urls AS (
  SELECT CASE
    WHEN doc_id % 4 = 0 THEN 'https://cal.example.org/events/' ||
      (doc_id % 20 + 2000) || '/' || (doc_id % 12 + 1) || '/' || doc_id
    WHEN doc_id % 4 = 1 THEN 'https://shop.example.org/session/' ||
      md5(doc_id::VARCHAR)
    ELSE 'https://site' || (doc_id % 3) || '.example.org' ||
      CASE doc_id % 5
        WHEN 0 THEN '/about'
        WHEN 1 THEN '/contact'
        WHEN 2 THEN '/post/' || doc_id
        WHEN 3 THEN '/tag/t' || (doc_id % 7)
        ELSE '/' END
    END AS url
  FROM documents),
shaped AS (
  SELECT DISTINCT
    lower(regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1))
      AS host,
    regexp_replace(regexp_replace(
      CASE WHEN regexp_extract(url,
             '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) = ''
           THEN '/'
           ELSE lower(regexp_extract(url,
             '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)) END,
      '[0-9a-f]{8,}', '{H}', 'g'), '[0-9]+', '{N}', 'g') AS pattern,
    url
  FROM urls),
counts AS (
  SELECT host, pattern, count(*) AS n_urls FROM shaped GROUP BY 1, 2)
SELECT host, pattern, n_urls,
       (sum(n_urls) OVER (PARTITION BY host))::BIGINT AS host_urls,
       n_urls >= 40 AND
       n_urls * 100 >= sum(n_urls) OVER (PARTITION BY host) * 50 AS is_trap
FROM counts
"""


def q_domain_priors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain (eTLD+1) rollup (functions/domains.py): the
    grouping key the per-source anti-dominance cap and domain quality
    priors must use — subdomain fan-out (blog0-4.example.co.uk +
    www.example.co.uk) folds into ONE publisher, two-label public
    suffixes (co.uk, com.au) take the third label, IP literals and
    single-label hosts pass through. The oracle restates the suffix rule
    over the same literal suffix list."""
    from wpextract_spark.functions.domains import registered_domain

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    host = (
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit("blog"), (d % 5).cast("string"),
                F.lit(".example.co.uk"),
            ),
        )
        .when(d % 6 == 1, F.lit("www.example.co.uk"))
        .when(
            d % 6 == 2,
            F.concat(
                F.lit("shop"), (d % 7).cast("string"),
                F.lit(".store.com.au"),
            ),
        )
        .when(d % 6 == 3, F.lit("deep.sub.domain.example.org"))
        .when(d % 6 == 4, F.lit("192.168.0.1"))
        .otherwise(F.lit("localhost"))
    )
    return (
        docs.select(registered_domain(host).alias("domain"), "n_chars")
        .groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


def _oracle_domain_priors() -> str:
    from wpextract_spark.functions.domains import MULTI_SUFFIXES

    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    return rf"""
WITH hosts AS (
  SELECT doc_id, n_chars,
         CASE doc_id % 6
           WHEN 0 THEN 'blog' || (doc_id % 5) || '.example.co.uk'
           WHEN 1 THEN 'www.example.co.uk'
           WHEN 2 THEN 'shop' || (doc_id % 7) || '.store.com.au'
           WHEN 3 THEN 'deep.sub.domain.example.org'
           WHEN 4 THEN '192.168.0.1'
           ELSE 'localhost' END AS host
  FROM documents),
lab AS (
  SELECT n_chars,
         lower(regexp_replace(host, '\.$', '')) AS h,
         string_split(lower(regexp_replace(host, '\.$', '')), '.') AS labels
  FROM hosts),
reg AS (
  SELECT n_chars,
    CASE
      WHEN regexp_matches(h, '^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$')
           OR len(labels) <= 1 THEN h
      WHEN len(labels) >= 3 AND
           array_to_string(labels[len(labels)-1:], '.') IN ({suffixes})
        THEN array_to_string(labels[len(labels)-2:], '.')
      ELSE array_to_string(labels[len(labels)-1:], '.')
    END AS domain
  FROM lab)
SELECT domain, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
FROM reg GROUP BY domain
"""


def q_domain_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level link-graph rollup (operators/anchors.py::
    domain_link_graph): page edges derive from lineitem keys with
    subdomain-meshed co.uk sources and a www/.org + .co.uk dst mix, so
    the eTLD+1 fold is doing real work (sub0-2.siteM.co.uk collapse into
    siteM.co.uk; intra marks the self-promotion edges). One projection +
    one hash agg on the domain pair. The oracle restates the host
    extraction, the suffix rule over the same literal list, and the
    rollup."""
    from wpextract_spark.operators.anchors import domain_link_graph

    li = _t(spark, sf_dir, "lineitem")
    s = F.col("l_orderkey") % 50
    t = F.col("l_partkey") % 40
    src_url = F.concat(
        F.lit("https://sub"), (s % 3).cast("string"),
        F.lit(".site"), (s % 10).cast("string"),
        F.lit(".co.uk/p/"), s.cast("string"),
    )
    dst_url = F.when(
        F.col("l_partkey") % 2 == 0,
        F.concat(
            F.lit("https://www.example"), (t % 5).cast("string"),
            F.lit(".org/x/"), t.cast("string"),
        ),
    ).otherwise(
        F.concat(
            F.lit("https://site"), (t % 10).cast("string"),
            F.lit(".co.uk/p/"), t.cast("string"),
        )
    )
    return domain_link_graph(
        li.select(src_url.alias("src_url"), dst_url.alias("dst_url"))
    )


def _sql_registered_domain(host_expr: str) -> str:
    """DuckDB restatement of functions/domains.py::registered_domain over
    a host-valued SQL expression (same literal suffix list)."""
    from wpextract_spark.functions.domains import MULTI_SUFFIXES

    suffixes = ", ".join(f"'{s}'" for s in MULTI_SUFFIXES)
    h = f"lower(regexp_replace({host_expr}, '\\.$', ''))"
    labels = f"string_split({h}, '.')"
    return rf"""CASE
      WHEN regexp_matches({h}, '^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$')
           OR len({labels}) <= 1 THEN {h}
      WHEN len({labels}) >= 3 AND
           array_to_string({labels}[len({labels})-1:], '.') IN ({suffixes})
        THEN array_to_string({labels}[len({labels})-2:], '.')
      ELSE array_to_string({labels}[len({labels})-1:], '.')
    END"""


def _oracle_domain_link_graph() -> str:
    def host(col: str) -> str:
        return (
            f"regexp_extract({col}, "
            "'^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]*)', 1)"
        )

    src_rule = _sql_registered_domain(host("src_url"))
    dst_rule = _sql_registered_domain(host("dst_url"))
    return rf"""
WITH e AS (
  SELECT 'https://sub' || (l_orderkey % 50) % 3 || '.site' ||
         (l_orderkey % 50) % 10 || '.co.uk/p/' || (l_orderkey % 50)
           AS src_url,
         CASE WHEN l_partkey % 2 = 0
           THEN 'https://www.example' || (l_partkey % 40) % 5 || '.org/x/' ||
                (l_partkey % 40)
           ELSE 'https://site' || (l_partkey % 40) % 10 || '.co.uk/p/' ||
                (l_partkey % 40) END AS dst_url
  FROM lineitem),
doms AS (
  SELECT {src_rule} AS src_domain,
         {dst_rule} AS dst_domain
  FROM e)
SELECT src_domain, dst_domain, count(*)::BIGINT AS n_links,
       src_domain = dst_domain AS intra
FROM doms GROUP BY src_domain, dst_domain
"""


def q_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation census (operators/sentences.py): documents
    get deterministic sentence-y text mixing protected abbreviations
    (Dr. / Mr. / No. / Fig. / e.g.), three terminator kinds, a
    multi-terminator run, and an unterminated tail. Integer outputs
    (counts and exact char totals) so the cross-engine hash has no float
    rounding hazard; the oracle restates the protect/extract/restore
    steps with RE2 regexes."""
    from wpextract_spark.operators.sentences import sentence_stats

    docs = _t(spark, sf_dir, "documents")
    text = F.concat(
        F.lit("Dr. Watson met Mr. "),
        F.substring(F.col("text"), 1, 30),
        F.lit(". The case (No. "),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(") was odd!! Was it? See Fig. 2 e.g. here. "),
        F.substring(F.col("text"), 31, 40),
    )
    return sentence_stats(
        docs.where(F.col("text").isNotNull())
        .select("doc_id", text.alias("text"))
    )


ORACLE_SENTENCE_STATS = r"""
WITH made AS (
  SELECT doc_id,
         'Dr. Watson met Mr. ' || substr(text, 1, 30) ||
         '. The case (No. ' || (doc_id % 10) ||
         ') was odd!! Was it? See Fig. 2 e.g. here. ' ||
         substr(text, 31, 40) AS text
  FROM documents WHERE text IS NOT NULL),
prot AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(text, '\b([ei])\.([ge])\.',
                          '\1' || chr(1) || '\2' || chr(1), 'g'),
           '\b(Mr|Mrs|Ms|Dr|Prof|St|vs|etc|No|Fig|Jr|Sr|Inc|Ltd|cf|al)\.',
           '\1' || chr(1), 'g') AS p
  FROM made),
sents AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_extract_all(p, '[^.!?]+[.!?]+|[^.!?]+$'),
             s -> trim(replace(s, chr(1), '.'))),
           s -> s != '') AS arr
  FROM prot)
SELECT doc_id,
       len(arr) AS n_sentences,
       coalesce(list_sum(list_transform(arr, s -> length(s))), 0)::BIGINT
         AS sentence_chars,
       coalesce(list_max(list_transform(arr, s -> length(s))), 0)
         AS max_sentence_len,
       arr[1] AS first_sentence
FROM sents
"""


def q_pathological_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-segment-repeat trap rule (operators/traps.py::
    pathological_path, Heritrix's PathologicalPathDecideRule): gallery-
    recursion and /x/x/x hit, a two-repeat and a non-consecutive repeat
    don't. RE2 has no backreferences, so BOTH engines run the windowed
    array-equality formulation — Spark exists/forall over sequences, the
    oracle list_filter over generate_series."""
    from wpextract_spark.operators.traps import pathological_path

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.lit("https://a.example.org"),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("/gallery/gallery/gallery/"), d.cast("string")),
        )
        .when(
            d % 4 == 1,
            F.concat(F.lit("/a/b/b/"), (d % 9).cast("string")),
        )
        .when(
            d % 4 == 2,
            F.concat(F.lit("/p/"), d.cast("string"), F.lit("/p")),
        )
        .otherwise(F.lit("/x/x/x")),
    )
    return docs.select(
        "doc_id",
        url.alias("url"),
        pathological_path(url).alias("pathological"),
    )


ORACLE_PATHOLOGICAL_PATHS = r"""
WITH u AS (
  SELECT doc_id,
         'https://a.example.org' ||
         CASE doc_id % 4
           WHEN 0 THEN '/gallery/gallery/gallery/' || doc_id
           WHEN 1 THEN '/a/b/b/' || (doc_id % 9)
           WHEN 2 THEN '/p/' || doc_id || '/p'
           ELSE '/x/x/x' END AS url
  FROM documents),
s AS (
  SELECT doc_id, url,
         list_filter(string_split(lower(regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1)), '/'),
           x -> x != '') AS segs
  FROM u)
SELECT doc_id, url,
  CASE WHEN len(segs) >= 3 THEN
    len(list_filter(generate_series(1, len(segs)-2),
        i -> segs[i] = segs[i+1] AND segs[i+1] = segs[i+2])) > 0
  ELSE FALSE END AS pathological
FROM s
"""


def q_fetch_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-respecting fetch plan (operators/frontier.py::
    fetch_schedule): the scheduler leg after frontier_priority — per-host
    priority ranking with deterministic url tie-break, k-th fetch offset
    (k-1)*crawl_delay seconds. Hosts exercise a declared slow delay, a
    null delay (falls back to the default), and the fast path. The
    oracle restates the window rank and the offset arithmetic (all
    delays binary-exact, so round(6) is hash-stable)."""
    from wpextract_spark.operators.frontier import fetch_schedule

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    frontier = docs.select(
        F.concat(
            F.lit("https://h"), (d % 7).cast("string"),
            F.lit(".example.org/p/"), d.cast("string"),
        ).alias("url"),
        F.concat(
            F.lit("h"), (d % 7).cast("string"), F.lit(".example.org")
        ).alias("host"),
        (d % 13).cast("double").alias("priority"),
        F.when(d % 7 == 0, F.lit(5.0))
        .when(d % 7 == 1, F.lit(None).cast("double"))
        .otherwise(F.lit(0.5))
        .alias("crawl_delay"),
    )
    return fetch_schedule(frontier, default_delay=1.0)


ORACLE_FETCH_SCHEDULE = r"""
WITH frontier AS (
  SELECT 'https://h' || (doc_id % 7) || '.example.org/p/' || doc_id AS url,
         'h' || (doc_id % 7) || '.example.org' AS host,
         (doc_id % 13)::DOUBLE AS priority,
         CASE WHEN doc_id % 7 = 0 THEN 5.0::DOUBLE
              WHEN doc_id % 7 = 1 THEN NULL
              ELSE 0.5::DOUBLE END AS crawl_delay
  FROM documents),
ranked AS (
  SELECT url, host,
         row_number() OVER (PARTITION BY host
                            ORDER BY priority DESC, url ASC)::BIGINT
           AS fetch_rank,
         coalesce(crawl_delay, 1.0::DOUBLE) AS delay
  FROM frontier)
SELECT url, host, fetch_rank,
       round((fetch_rank - 1) * delay, 6)::DOUBLE AS fetch_offset_s
FROM ranked
"""


def q_sentence_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-boundary-respecting chunker (operators/sentences.py::
    sentence_chunks, chunk_chars=80): constructed five-sentence docs span
    three chunks, so the offset window, the floor placement, and the
    position-sorted rebuild all do real work. The oracle restates the
    split, the cumulative start offsets, and the ORDER BY string
    rebuild."""
    from wpextract_spark.operators.sentences import sentence_chunks

    docs = _t(spark, sf_dir, "documents")
    text = F.concat(
        F.substring(F.col("text"), 1, 35), F.lit(". "),
        F.substring(F.col("text"), 36, 45), F.lit("! "),
        F.substring(F.col("text"), 81, 30), F.lit("? "),
        F.substring(F.col("text"), 111, 60), F.lit(". tail "),
        (F.col("doc_id") % 5).cast("string"),
    )
    return sentence_chunks(
        docs.where(F.col("text").isNotNull())
        .select("doc_id", text.alias("text")),
        chunk_chars=80,
    )


ORACLE_SENTENCE_CHUNKS = r"""
WITH made AS (
  SELECT doc_id,
         substr(text, 1, 35) || '. ' || substr(text, 36, 45) || '! ' ||
         substr(text, 81, 30) || '? ' || substr(text, 111, 60) ||
         '. tail ' || (doc_id % 5) AS text
  FROM documents WHERE text IS NOT NULL),
prot AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(text, '\b([ei])\.([ge])\.',
                          '\1' || chr(1) || '\2' || chr(1), 'g'),
           '\b(Mr|Mrs|Ms|Dr|Prof|St|vs|etc|No|Fig|Jr|Sr|Inc|Ltd|cf|al)\.',
           '\1' || chr(1), 'g') AS p
  FROM made),
sents AS (
  SELECT doc_id,
         list_filter(
           list_transform(
             regexp_extract_all(p, '[^.!?]+[.!?]+|[^.!?]+$'),
             s -> trim(replace(s, chr(1), '.'))),
           s -> s != '') AS arr
  FROM prot),
exploded AS (
  SELECT doc_id, u.pos AS pos, arr[u.pos] AS sentence
  FROM sents, LATERAL unnest(generate_series(1, len(arr))) AS u(pos)),
placed AS (
  SELECT doc_id, pos, sentence,
         coalesce(sum(length(sentence) + 1) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM exploded),
chunks AS (
  SELECT doc_id, (start_off // 80)::BIGINT AS chunk_id,
         count(*)::BIGINT AS n_sentences,
         string_agg(sentence, ' ' ORDER BY pos) AS chunk_text
  FROM placed GROUP BY doc_id, start_off // 80)
SELECT doc_id, chunk_id, n_sentences,
       length(chunk_text)::BIGINT AS chunk_len, chunk_text
FROM chunks
"""


QUERIES = {
    # --- Stalest-first driver-window ordering (maintained by
    # scripts/rotate_registry.py): the correctness driver checks
    # the FIRST 50 entries, so queries with the least / oldest
    # driver-green history lead and multi-round-green entries sit
    # at the tail (those are additionally pinned by the pytest
    # gate and byte-parity e2e).
    "q_mjpeg_stream_frames": q_mjpeg_stream_frames,
    "q_containment_dups": q_containment_dups,
    "q_feed_parse": q_feed_parse,
    "q_surt_keys": q_surt_keys,
    "q_url_traps": q_url_traps,
    "q_sentence_stats": q_sentence_stats,
    "q_domain_priors": q_domain_priors,
    "q_domain_link_graph": q_domain_link_graph,
    "q_fetch_schedule": q_fetch_schedule,
    "q_sentence_chunks": q_sentence_chunks,
    "q_pathological_paths": q_pathological_paths,
    "q_compression_signal": q_compression_signal,
    "q_repetition_stats": q_repetition_stats,
    "q_gopher_quality": q_gopher_quality,
    "q_bm25": q_bm25,
    "q_png_pixels": q_png_pixels,
    "q_asof_join": q_asof_join,
    "q_asof_forward": q_asof_forward,
    "q_sessionize": q_sessionize,
    "q_range_join": q_range_join,
    "q_inverted_index": q_inverted_index,
    "q_user_deciles": q_user_deciles,
    "q_value_bands": q_value_bands,
    "q_collocations": q_collocations,
    "q_events_cube": q_events_cube,
    "q_dedup_clusters": q_dedup_clusters,
    "q_similarity_ivf_kmeans": q_similarity_ivf_kmeans,
    "q_lang_id_ngram": q_lang_id_ngram,
    "q_bpe_tokens": q_bpe_tokens,
    "q_image_meta": q_image_meta,
    "q_audio_meta": q_audio_meta,
    "q_extract_text_kernel": q_extract_text_kernel,
    "q_extract_link_spans": q_extract_link_spans,
    "q_extract_locale": q_extract_locale,
    "q_registry_last_wins": q_registry_last_wins,
    "q_crawl_first_wins": q_crawl_first_wins,
    "q_symmetrize_edges": q_symmetrize_edges,
    "q_resolution_broadcast": q_resolution_broadcast,
    "q_pricing_summary": q_pricing_summary,
    "q_order_priority": q_order_priority,
    "q_events_hourly": q_events_hourly,
    "q_dedup_exact": q_dedup_exact,
    "q_minhash_signatures": q_minhash_signatures,
    "q_lsh_candidate_pairs": q_lsh_candidate_pairs,
    "q_dedup_pipeline": q_dedup_pipeline,
    "q_ngram_jaccard": q_ngram_jaccard,
    "q_simhash": q_simhash,
    "q_similarity_topk": q_similarity_topk,
    "q_similarity_lsh": q_similarity_lsh,
    "q_similarity_ivf": q_similarity_ivf,
    "q_embedding_near_dups": q_embedding_near_dups,
    "q_simhash_near_dups": q_simhash_near_dups,
    "q_salted_agg": q_salted_agg,
    "q_salted_join": q_salted_join,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_token_stats": q_token_stats,
    "q_quality_scores": q_quality_scores,
    "q_fingerprints": q_fingerprints,
    "q_lang_id": q_lang_id,
    # ---- below the 50-entry driver window ----
    "q_multimodal_features": q_multimodal_features,
    "q_frame_sample": q_frame_sample,
    "q_pages_extract": q_pages_extract,
    "q_pdf_roundtrip": q_pdf_roundtrip,
    "q_main_content": q_main_content,
    "q_robots_filter": q_robots_filter,
    "q_redirect_chains": q_redirect_chains,
    "q_normalize_text": q_normalize_text,
    "q_dedup_keys": q_dedup_keys,
    "q_fix_mojibake": q_fix_mojibake,
    "q_render_markdown": q_render_markdown,
    "q_site_boilerplate": q_site_boilerplate,
    "q_recrawl_priority": q_recrawl_priority,
    "q_incremental_extract": q_incremental_extract,
    "q_robots_directives": q_robots_directives,
    "q_jsonld_extract": q_jsonld_extract,
    "q_hreflang_alternates": q_hreflang_alternates,
    "q_sitemap_parse": q_sitemap_parse,
    "q_frontier_priority": q_frontier_priority,
    "q_publish_dates": q_publish_dates,
    "q_warc_extract": q_warc_extract,
    "q_jpeg_pixels": q_jpeg_pixels,
    "q_bpe_encode": q_bpe_encode,
    "q_video_frames": q_video_frames,
    "q_audio_pcm": q_audio_pcm,
    "q_lm_perplexity": q_lm_perplexity,
    "q_semantic_dedup": q_semantic_dedup,
    "q_image_ahash_dups": q_image_ahash_dups,
    "q_similarity_pq": q_similarity_pq,
    "q_similarity_ivfpq": q_similarity_ivfpq,
    "q_url_filter": q_url_filter,
    "q_chunk_documents": q_chunk_documents,
    "q_source_mix": q_source_mix,
    "q_snapshot_diff": q_snapshot_diff,
    "q_anchor_texts": q_anchor_texts,
    "q_page_metadata": q_page_metadata,
    "q_line_dedup": q_line_dedup,
    "q_pii_scrub": q_pii_scrub,
    "q_c4_filter": q_c4_filter,
    "q_source_cap": q_source_cap,
    "q_sequence_pack": q_sequence_pack,
    "q_url_dedup": q_url_dedup,
    "q_curation_pipeline": q_curation_pipeline,
    "q_decontaminate": q_decontaminate,
    "q_stratified_sample": q_stratified_sample,
    "q_hash_split": q_hash_split,
    "q_incremental_dedup": q_incremental_dedup,
    "q_pagerank": q_pagerank,
    "q_span_dups": q_span_dups,
    "q_pack_sequences": q_pack_sequences,
    "q_corpus_profile": q_corpus_profile,
    "q_vocab_build": q_vocab_build,
    "q_tfidf_vectors": q_tfidf_vectors,
    "q_classify_changes": q_classify_changes,
}

ORACLES = {
    "q_surt_keys": ORACLE_SURT_KEYS,
    "q_url_traps": ORACLE_URL_TRAPS,
    "q_sentence_stats": ORACLE_SENTENCE_STATS,
    "q_domain_priors": _oracle_domain_priors(),
    "q_domain_link_graph": _oracle_domain_link_graph(),
    "q_fetch_schedule": ORACLE_FETCH_SCHEDULE,
    "q_sentence_chunks": ORACLE_SENTENCE_CHUNKS,
    "q_pathological_paths": ORACLE_PATHOLOGICAL_PATHS,
    "q_extract_text_kernel": ORACLE_EXTRACT_TEXT,
    "q_extract_link_spans": ORACLE_LINK_SPANS,
    "q_extract_locale": ORACLE_LOCALE,
    "q_registry_last_wins": ORACLE_LAST_WINS,
    "q_crawl_first_wins": ORACLE_FIRST_WINS,
    "q_symmetrize_edges": ORACLE_SYMMETRIZE,
    "q_resolution_broadcast": ORACLE_RESOLUTION,
    "q_pricing_summary": ORACLE_PRICING,
    "q_order_priority": ORACLE_ORDER_PRIORITY,
    "q_events_hourly": ORACLE_EVENTS_HOURLY,
    "q_asof_join": ORACLE_ASOF_JOIN,
    "q_asof_forward": ORACLE_ASOF_FORWARD,
    "q_sessionize": ORACLE_SESSIONIZE,
    "q_range_join": ORACLE_RANGE_JOIN,
    "q_inverted_index": ORACLE_INVERTED_INDEX,
    "q_user_deciles": ORACLE_USER_DECILES,
    "q_value_bands": ORACLE_VALUE_BANDS,
    "q_bm25": ORACLE_BM25,
    "q_collocations": ORACLE_COLLOCATIONS,
    "q_events_cube": ORACLE_EVENTS_CUBE,
    "q_dedup_exact": ORACLE_DEDUP_EXACT,
    "q_minhash_signatures": ORACLE_MINHASH,
    "q_lsh_candidate_pairs": ORACLE_LSH_PAIRS,
    "q_dedup_pipeline": ORACLE_DEDUP_PIPELINE,
    "q_dedup_clusters": ORACLE_DEDUP_CLUSTERS,
    "q_ngram_jaccard": ORACLE_NGRAM_JACCARD,
    "q_simhash": _oracle_simhash(8),
    "q_similarity_topk": ORACLE_SIM_TOPK,
    "q_similarity_lsh": _oracle_sim_lsh(),
    "q_similarity_ivf": _oracle_sim_ivf(),
    "q_similarity_ivf_kmeans": _oracle_sim_ivf_kmeans(),
    "q_embedding_near_dups": _oracle_emb_near_dups(),
    "q_simhash_near_dups": _oracle_simhash_near_dups(),
    "q_salted_agg": ORACLE_SALTED_AGG,
    "q_salted_join": ORACLE_SALTED_JOIN,
    "q_revenue_by_nation": ORACLE_REVENUE_BY_NATION,
    "q_token_stats": ORACLE_TOKEN_STATS,
    "q_quality_scores": _oracle_quality(),
    "q_fingerprints": ORACLE_FINGERPRINTS,
    "q_lang_id": _oracle_lang_id(),
    "q_lang_id_ngram": _oracle_lang_id_ngram(),
    "q_bpe_tokens": _oracle_bpe_tokens(),
    "q_multimodal_features": ORACLE_MULTIMODAL,
    "q_image_meta": ORACLE_IMAGE_META,
    "q_png_pixels": ORACLE_PNG_PIXELS,
    "q_warc_extract": ORACLE_WARC_EXTRACT,
    "q_jpeg_pixels": ORACLE_JPEG_PIXELS,
    "q_bpe_encode": _oracle_bpe_encode(),
    "q_video_frames": ORACLE_VIDEO_FRAMES,
    "q_mjpeg_stream_frames": ORACLE_VIDEO_FRAMES,
    "q_audio_pcm": ORACLE_AUDIO_PCM,
    "q_lm_perplexity": ORACLE_LM_PERPLEXITY,
    "q_semantic_dedup": _oracle_semantic_dedup(),
    "q_image_ahash_dups": ORACLE_IMAGE_AHASH,
    "q_similarity_pq": _oracle_similarity_pq(),
    "q_similarity_ivfpq": _oracle_similarity_ivfpq(),
    "q_url_filter": ORACLE_URL_FILTER,
    "q_chunk_documents": ORACLE_CHUNK_DOCUMENTS,
    "q_source_mix": ORACLE_SOURCE_MIX,
    "q_snapshot_diff": ORACLE_SNAPSHOT_DIFF,
    "q_anchor_texts": ORACLE_ANCHOR_TEXTS,
    "q_page_metadata": ORACLE_PAGE_METADATA,
    "q_robots_filter": ORACLE_ROBOTS_FILTER,
    "q_redirect_chains": ORACLE_REDIRECT_CHAINS,
    "q_normalize_text": ORACLE_NORMALIZE_TEXT,
    "q_dedup_keys": ORACLE_DEDUP_KEYS,
    "q_fix_mojibake": ORACLE_FIX_MOJIBAKE,
    "q_render_markdown": ORACLE_RENDER_MARKDOWN,
    "q_site_boilerplate": ORACLE_SITE_BOILERPLATE,
    "q_recrawl_priority": ORACLE_RECRAWL_PRIORITY,
    "q_incremental_extract": ORACLE_INCREMENTAL_EXTRACT,
    "q_robots_directives": ORACLE_ROBOTS_DIRECTIVES,
    "q_jsonld_extract": ORACLE_JSONLD_EXTRACT,
    "q_hreflang_alternates": ORACLE_HREFLANG_ALTERNATES,
    "q_sitemap_parse": ORACLE_SITEMAP_PARSE,
    "q_frontier_priority": ORACLE_FRONTIER_PRIORITY,
    "q_publish_dates": ORACLE_PUBLISH_DATES,
    "q_classify_changes": ORACLE_CLASSIFY_CHANGES,
    "q_containment_dups": ORACLE_CONTAINMENT_DUPS,
    "q_feed_parse": ORACLE_FEED_PARSE,
    "q_audio_meta": ORACLE_AUDIO_META,
    "q_frame_sample": ORACLE_FRAME_SAMPLE,
    "q_pdf_roundtrip": ORACLE_PDF_ROUNDTRIP,
    "q_main_content": ORACLE_MAIN_CONTENT,
    "q_pages_extract": _oracle_pages_extract(),
    "q_repetition_stats": _oracle_repetition_stats(),
    "q_gopher_quality": _oracle_gopher_quality(),
    "q_line_dedup": ORACLE_LINE_DEDUP,
    "q_pii_scrub": _oracle_pii_scrub(),
    "q_c4_filter": _oracle_c4_filter(),
    "q_source_cap": ORACLE_SOURCE_CAP,
    "q_sequence_pack": _oracle_sequence_pack(),
    "q_url_dedup": ORACLE_URL_DEDUP,
    "q_curation_pipeline": _oracle_curation_pipeline(),
    "q_decontaminate": _oracle_decontaminate(),
    "q_stratified_sample": _oracle_stratified_sample(),
    "q_hash_split": _oracle_hash_split(),
    "q_incremental_dedup": ORACLE_INCREMENTAL_DEDUP,
    "q_pagerank": _oracle_pagerank(),
    "q_span_dups": _oracle_span_dups(),
    "q_pack_sequences": _oracle_pack_sequences(),
    "q_corpus_profile": ORACLE_CORPUS_PROFILE,
    "q_vocab_build": ORACLE_VOCAB_BUILD,
    "q_tfidf_vectors": ORACLE_TFIDF,
}

# Construction-derived golden (needs the sf0.01 corpus on disk; skipped —
# leaving a rows-only check — only if the corpus is absent).
_COMPRESSION_ORACLE = _oracle_compression_signal()
if _COMPRESSION_ORACLE is not None:
    ORACLES["q_compression_signal"] = _COMPRESSION_ORACLE
