"""URL canonicalization as pure column expressions.

Common-Crawl-style corpora dedup on the *canonical* URL: the same page is
crawled as ``https://Example.org/post/7/?utm_source=feed#top`` and
``https://example.org/post/7?utm_source=x``, and byte-level url equality
misses the duplicate. The canonical form here:

* fragment stripped;
* scheme and host lowercased (path/query case is preserved — it is
  significant on most servers);
* default ports dropped (``:80`` for http, ``:443`` for https);
* tracking query parameters removed (``utm_*``, ``fbclid``, ``gclid``,
  ``ref``), remaining parameters sorted for order independence;
* single trailing slash stripped from non-root paths.

Everything is built-in JVM expressions (whole-stage codegen, no UDF) and
deliberately avoids regex features that differ between engines: no
lookaround, no backreferences, no captures in replacements — so the DuckDB
oracles restate the identical logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Query parameters that never identify content. Anchored match against the
#: "name=value" (or bare "name") token.
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def canonicalize_url(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(u, "#.*", "")  # fragment

    prefix = F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)", 1)
    rest = F.substring(u, F.length(prefix) + 1, F.lit(2_000_000_000))
    prefix = F.lower(prefix)
    prefix = F.when(
        prefix.startswith("https://") & prefix.endswith(":443"),
        F.substring(prefix, 1, F.length(prefix) - 4),
    ).when(
        prefix.startswith("http://") & prefix.endswith(":80"),
        F.substring(prefix, 1, F.length(prefix) - 3),
    ).otherwise(prefix)

    qpos = F.instr(rest, "?")
    path = F.when(qpos > 0, F.substring(rest, 1, qpos - 1)).otherwise(rest)
    query = F.when(
        qpos > 0, F.substring(rest, qpos + 1, F.lit(2_000_000_000))
    ).otherwise(F.lit(""))

    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)

    params = F.array_sort(
        F.filter(
            F.split(query, "&", -1),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )
    qcanon = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.concat_ws("&", params))
    ).otherwise(F.lit(""))
    return F.concat(prefix, path, qcanon)


def surt_key(url: Column | str) -> Column:
    """Sort-friendly URI Reordering Transform (SURT) key, the web-archiving
    canonical form used by Heritrix / OpenWayback / Common Crawl's CDX
    indexes: ``https://www.blog.example.org:8080/Post/7?b=2&a=1`` becomes
    ``org,example,blog:8080)/post/7?a=1&b=2``.

    Built on :func:`canonicalize_url` (fragment stripped, default ports
    dropped, tracking params removed, query sorted), then:

    * scheme dropped — http/https duplicates collapse;
    * a single leading ``www<digits>.`` label dropped;
    * host labels reversed and comma-joined, so all URLs of a registered
      domain sort adjacently — range-partitioning a 10^12-row crawl index
      on this key gives per-site locality for free (host-level scans stay
      partition-pruned instead of scattering over the table);
    * non-default port kept after the reversed host (``:8080``);
    * path + query lowercased (SURT semantics: rest-of-URL case folds).

    Pure column expressions, whole-stage codegen, no lookaround / no
    backreference regex — the DuckDB oracle restates the identical steps.
    """
    u = canonicalize_url(url)
    prefix = F.regexp_extract(u, r"^([a-z][a-z0-9+.-]*://[^/?#]*)", 1)
    rest = F.lower(F.substring(u, F.length(prefix) + 1, F.lit(2_000_000_000)))
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    hostport = F.regexp_extract(prefix, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www[0-9]*\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    portpart = F.when(port != "", F.concat(F.lit(":"), port)).otherwise(
        F.lit("")
    )
    return F.concat(rev, portpart, F.lit(")"), rest)
