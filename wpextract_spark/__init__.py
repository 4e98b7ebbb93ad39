"""wpextract_spark — a PySpark-native WordPress/web-page dataset builder.

A from-scratch reimplementation of the capabilities of GateNLP/wpextract as a
distributed Spark pipeline over Common-Crawl-style page tables. See README.md.

Library surface (mirrors the reference's ``from wpextract import
WPExtractor`` embedding, ``/root/reference/src/wpextract/__init__.py:3-4``):

    from wpextract_spark import SparkSiteExtractor, ResumableExtractJob

Attributes resolve lazily so kernel-only consumers (pure-Python HTML/PDF
parsing, no JVM) don't pay the pyspark import.
"""

__version__ = "0.1.0"

_LAZY = {
    "SparkSiteExtractor": ("wpextract_spark.plans.pipeline", "SparkSiteExtractor"),
    "ResumableExtractJob": ("wpextract_spark.plans.job", "ResumableExtractJob"),
    "LangPicker": ("wpextract_spark.kernel.translations", "LangPicker"),
    "parse_html": ("wpextract_spark.htmlkit.dom", "parse_html"),
    "extract_content": ("wpextract_spark.kernel.content", "extract_content"),
    "extract_main_content": ("wpextract_spark.kernel.maincontent", "extract_main_content"),
    "extract_pdf_text": ("wpextract_spark.kernel.pdf", "extract_pdf_text"),
    "get_session": ("wpextract_spark.session", "get_session"),
}


def __getattr__(name):
    try:
        module_name, attr = _LAZY[name]
    except KeyError:
        raise AttributeError(f"module {__name__!r} has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module_name), attr)


def __dir__():
    return sorted(set(globals()) | set(_LAZY))
