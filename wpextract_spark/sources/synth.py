"""Deterministic synthetic Common-Crawl-style pages table.

Generates ``pages(url, warc_ts, html, text, lang)`` per the BASELINE.json
``input_hint`` for tests, the driver entry point, and the scaling benchmark.
Fully distributed (``spark.range`` -> ``mapInPandas``) and fully deterministic:
every field derives from ``sha256(seed, id)`` — same output for any partition
count, executor count or run.

Scale/skew knobs (FIXTURES.md §4): log-uniform domain ranks give a Zipf-ish
"mega-site" skew; content sizes are log-uniform across ~2 decades; pages embed
internal links (exact, ``/category/slug/`` form, ``?preview_id=``), external
links, figures with captions, tables (excluded from text), comments, iframes,
and a Polylang widget on multilingual pages.
"""

from __future__ import annotations

import hashlib
import math
from datetime import datetime, timedelta
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

LANGS = ["en", "fr", "de", "es", "zh"]

_WORDS = (
    "key agg row scan slow fast table value part hash merge batch spark line sort "
    "window order data column join small customer query big group stream filter "
    "document corpus crawl page extract parse text span link image embed caption"
).split()


def _h(seed: int, doc_id: int, salt: str) -> int:
    digest = hashlib.sha256(f"{seed}:{doc_id}:{salt}".encode()).digest()
    return int.from_bytes(digest[:8], "big")


def _u01(seed: int, doc_id: int, salt: str) -> float:
    return _h(seed, doc_id, salt) / 2**64


def _words(seed: int, doc_id: int, salt: str, count: int) -> str:
    base = _h(seed, doc_id, salt)
    return " ".join(_WORDS[(base + i * 2654435761) % len(_WORDS)] for i in range(count))


def synth_page(
    doc_id: int, seed: int = 42, n_domains: int = 1000, with_expected: bool = False
) -> dict:
    """One deterministic page record (driver- and executor-side identical)."""
    # Zipf-ish domain skew: rank log-uniform in [0, n_domains).
    rank = int(math.exp(_u01(seed, doc_id, "dom") * math.log(max(n_domains, 2)))) - 1
    domain = f"site{rank}.example.org"
    lang = LANGS[_h(seed, doc_id, "lang") % len(LANGS)]
    lang_prefix = f"/{lang}" if lang != "en" else ""
    slug = f"post-{doc_id}"
    url = f"https://{domain}{lang_prefix}/2024/{1 + doc_id % 12:02d}/{slug}/"

    # Content size: log-uniform words count, ~30 .. ~3000 words.
    n_words = int(30 * math.exp(_u01(seed, doc_id, "size") * math.log(100)))

    paragraphs = []
    chunk = 40
    for p in range(0, n_words, chunk):
        paragraphs.append(f"<p>{_words(seed, doc_id, f'p{p}', min(chunk, n_words - p))}</p>")

    # Internal links: exact neighbor, category-form, preview_id.
    neighbor = f"https://{domain}{lang_prefix}/2024/{1 + (doc_id + 1) % 12:02d}/post-{doc_id + 1}/"
    spans = [
        f'<a href="{neighbor}">next {_words(seed, doc_id, "a1", 2)}</a>',
        f'<a href="https://{domain}/news/post-{doc_id + 2}/">category form</a>',
        f'<a href="https://{domain}/post-{doc_id + 3}/?preview_id={doc_id}">preview</a>',
        f'<a href="https://external-{doc_id % 7}.example.com/x">external</a>',
    ]
    figure = (
        f'<figure><img src="/wp-content/uploads/img-{doc_id}-300x200.jpg" alt="img {doc_id}"/>'
        f"<figcaption>caption {_words(seed, doc_id, 'cap', 3)}</figcaption></figure>"
    )
    table = "<table><tr><td>boilerplate stats excluded from text</td></tr></table>"
    comment = "<!-- render boundary -->"
    iframe = (
        f'<iframe src="https://videos.example.com/embed/{doc_id}"></iframe>'
        if doc_id % 5 == 0
        else ""
    )
    picker = ""
    if doc_id % 4 == 0:
        other = LANGS[(_h(seed, doc_id, "lang") + 1) % len(LANGS)]
        picker = (
            '<div class="widget widget_polylang"><ul>'
            f'<li class="lang-item current-lang"><a lang="{lang}" href="{url}">cur</a></li>'
            f'<li class="lang-item"><a lang="{other}" href="https://{domain}/{other}/2024/01/{slug}-{other}/">t</a></li>'
            '<li class="lang-item no-translation"><a lang="it" href="https://%s/it/">it</a></li>'
            "</ul></div>" % domain
        )

    body = "\n".join([picker, *paragraphs[: len(paragraphs) // 2], figure, table,
                      comment, *spans, iframe, *paragraphs[len(paragraphs) // 2 :]])
    html = (
        "<!doctype html><html><head>"
        f'<link rel="canonical" href="{url}"/>'
        f'<meta property="og:url" content="{url}"/>'
        f"<title>Post {doc_id}</title></head><body><nav>home | about</nav>"
        f"<main>{body}</main>"
        "<footer>share widgets | comment form</footer></body></html>"
    )
    warc_ts = datetime(2024, 1, 1) + timedelta(seconds=doc_id % 31536000)
    row = {
        "url": url,
        "warc_ts": warc_ts,
        "html": html.encode("utf-8"),
        "text": _words(seed, doc_id, "crawltext", 12),
        "lang": lang,
    }
    if not with_expected:
        # Skip the expected-output composition in the generation hot path
        # (bench/scaling runs build 10^5-10^6 pages; only the oracle builder
        # needs expected_*).
        return row

    # Expected extraction outputs, stated BY CONSTRUCTION (not by running the
    # kernel): the page intentionally embeds these texts/spans, so the kernel
    # must recover them. Elements the extractor removes (figure, table,
    # comment, iframe) contribute no text; their source-newline separators
    # collapse under whitespace squashing. This is the q_pages_extract oracle.
    from wpextract_spark.functions.text import squash_whitespace

    picker_text = "curtit" if picker else ""
    para_texts = [p[3:-4] for p in paragraphs]  # strip <p>/</p>
    span_texts = [
        f"next {_words(seed, doc_id, 'a1', 2)}",
        "category form",
        "preview",
        "external",
    ]
    half = len(paragraphs) // 2
    body_texts = [picker_text, *para_texts[:half], "", "", "",
                  *span_texts, "", *para_texts[half:]]
    row["expected_text"] = squash_whitespace(
        f"Post {doc_id}" + "home | about" + "\n".join(body_texts)
        + "share widgets | comment form"
    )
    row["expected_n_internal"] = 3 + (3 if picker else 0)
    row["expected_n_external"] = 1
    row["expected_n_images"] = 1
    row["expected_n_embeds"] = 1 if iframe else 0
    return row


PAGES_SCHEMA = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_domains: int = 1000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic pages table of ``n_pages`` rows."""

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = [synth_page(int(i), seed, n_domains) for i in batch["id"]]
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    base = spark.range(n_pages, numPartitions=partitions)
    return base.mapInPandas(_gen, PAGES_SCHEMA)
