"""Registered-domain (eTLD+1) extraction as pure column expressions.

Per-source caps, domain quality priors, and politeness budgets must key on
the *registered* domain, not the host: ``blog.example.co.uk`` and
``www.example.co.uk`` are one publisher (``example.co.uk``), and treating
every subdomain as its own source lets a mega-site dodge the
anti-dominance cap with wildcard subdomains (RefinedWeb/Dolma cap per
registered domain for exactly this reason).

The full public-suffix list is a ~10k-entry data file; corpus curation
needs the *rule*, plus the multi-label suffixes that actually carry mass
in web corpora. ``MULTI_SUFFIXES`` below covers the high-traffic
two-label public suffixes (ccTLD second-level registries); longer PSL
entries (``act.edu.au``-style) and the wildcard/exception rules are a
documented seam — swap ``MULTI_SUFFIXES`` for the full PSL set (it is
just a literal IN-list; at 10k entries Catalyst compiles it to a hash
lookup) when exactness on exotic ccTLDs matters.

Everything is built-in JVM expressions (split / slice / concat_ws /
isin — whole-stage codegen, no UDF, no shuffle); the DuckDB oracle
restates the identical rule over the same suffix list.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: High-traffic two-label public suffixes (ccTLD second-level registries).
MULTI_SUFFIXES = (
    # UK
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk", "sch.uk",
    "ltd.uk", "plc.uk", "nhs.uk",
    # Australia / New Zealand
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "geek.nz",
    # Japan / Korea / China / Taiwan / Hong Kong / Singapore
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp", "ad.jp", "ed.jp",
    "co.kr", "or.kr", "ne.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "com.tw", "org.tw", "net.tw", "edu.tw", "gov.tw", "idv.tw",
    "com.hk", "org.hk", "net.hk", "edu.hk", "gov.hk",
    "com.sg", "org.sg", "net.sg", "edu.sg", "gov.sg",
    # Americas
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "com.mx", "org.mx",
    "net.mx", "gob.mx", "edu.mx", "com.ar", "org.ar", "net.ar", "edu.ar",
    "gob.ar", "com.co", "org.co", "net.co", "edu.co", "gov.co", "com.pe",
    "org.pe", "net.pe", "com.ve", "org.ve", "com.uy", "com.ec", "com.cl",
    # South / Southeast Asia, Middle East, Africa, Europe ccSLDs
    "co.in", "org.in", "net.in", "firm.in", "gen.in", "ind.in", "ac.in",
    "edu.in", "gov.in", "res.in", "co.th", "or.th", "ac.th", "go.th",
    "in.th", "com.my", "org.my", "net.my", "edu.my", "gov.my", "com.ph",
    "org.ph", "net.ph", "com.vn", "org.vn", "net.vn", "edu.vn", "gov.vn",
    "com.pk", "org.pk", "net.pk", "edu.pk", "gov.pk", "com.bd", "org.bd",
    "net.bd", "edu.bd", "gov.bd", "com.np", "org.np", "com.tr", "org.tr",
    "net.tr", "edu.tr", "gov.tr", "gen.tr", "web.tr", "com.sa", "org.sa",
    "net.sa", "edu.sa", "gov.sa", "com.eg", "org.eg", "net.eg", "edu.eg",
    "gov.eg", "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "com.ua", "org.ua", "net.ua", "edu.ua", "gov.ua", "in.ua", "kiev.ua",
    "co.za", "org.za", "net.za", "web.za", "ac.za", "gov.za", "co.ke",
    "or.ke", "ac.ke", "go.ke", "com.ng", "org.ng", "net.ng", "edu.ng",
    "gov.ng", "com.gh", "org.gh", "edu.gh",
    "com.pl", "org.pl", "net.pl", "edu.pl", "gov.pl", "waw.pl",
    "com.ru", "org.ru", "net.ru", "msk.ru", "spb.ru",
    "com.gr", "org.gr", "net.gr", "edu.gr", "gov.gr",
    "com.pt", "org.pt", "edu.pt", "gov.pt", "co.at", "or.at", "ac.at",
    "gv.at", "co.hu", "org.hu", "com.ro", "org.ro", "co.rs", "org.rs",
    "com.es", "org.es", "nom.es", "gob.es", "edu.es",
)


def registered_domain(host: Column | str) -> Column:
    """eTLD+1 of a hostname: ``blog.example.co.uk`` -> ``example.co.uk``,
    ``deep.sub.example.org`` -> ``example.org``. IP literals and
    single-label hosts (``localhost``) pass through unchanged."""
    h = F.col(host) if isinstance(host, str) else host
    h = F.lower(F.regexp_replace(h, r"\.$", ""))  # FQDN trailing dot
    labels = F.split(h, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(".", F.slice(labels, n - 1, 2))
    last3 = F.concat_ws(".", F.slice(labels, n - 2, 3))
    is_ip = h.rlike(r"^[0-9]+\.[0-9]+\.[0-9]+\.[0-9]+$")
    return (
        F.when(is_ip | (n <= 1), h)
        .when((n >= 3) & last2.isin(*MULTI_SUFFIXES), last3)
        .otherwise(last2)
    )
