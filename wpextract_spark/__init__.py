"""wpextract_spark — a PySpark-native WordPress/web-page dataset builder.

A from-scratch reimplementation of the capabilities of GateNLP/wpextract as a
distributed Spark pipeline over Common-Crawl-style page tables. See README.md.
"""

__version__ = "0.1.0"
