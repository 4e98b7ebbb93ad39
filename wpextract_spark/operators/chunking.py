"""Document chunking: overlapping word windows with provenance offsets.

The standard prep pass between a curated corpus and embedding/training:
long documents become fixed-size overlapping chunks, each carrying
``(doc_id, chunk_id, start_word)`` so downstream near-dup hits, citations,
or pack offsets map back to an exact span of the source document.

Scale shape: the whole operator is ONE row-local expression — the window
list is built per row with ``transform(sequence(...))`` and exploded in
place, so there is NO shuffle anywhere; chunk rows inherit the parent
scan's partitioning and the stage stays inside whole-stage codegen. Output
size is input words x (1 + overlap/stride), the unavoidable duplication
overlap buys. Fan-out is bounded per row by the document's own length
(same argument as the n-gram explodes in ``operators/dedup.py``), so no
hot keys exist by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wpextract_spark.operators.dedup import WS


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into ``chunk_size``-word windows advancing by
    ``chunk_size - overlap`` words. Output: ``(id, chunk_id, start_word,
    n_words, chunk_text)``; the final window may be short, and every word
    of the document appears in at least one chunk
    (``n_chunks = 1 + ceil(max(0, n - chunk_size) / stride)``).

    Whitespace-splitting follows the repo-wide ``WS`` class (engine-portable);
    a whitespace-only document yields one chunk of the empty string — the
    same ``split('') == ['']`` convention as token_stats."""
    if overlap >= chunk_size:
        raise ValueError(f"overlap {overlap} must be < chunk_size {chunk_size}")
    stride = chunk_size - overlap
    words = F.split(F.trim(F.col(text_col)), WS, -1)
    n = F.size(words)
    # integer ceil((n - chunk_size)+ / stride) without float division
    n_chunks = F.lit(1) + F.floor(
        (F.greatest(n - chunk_size, F.lit(0)) + (stride - 1)) / stride
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).cast("int").alias("start_word"),
            F.slice(words, i * stride + 1, chunk_size).alias("w"),
        ),
    )
    return (
        docs.select(F.col(id_col), F.explode(windows).alias("c"))
        .select(
            F.col(id_col),
            F.col("c.chunk_id"),
            F.col("c.start_word"),
            F.size("c.w").alias("n_words"),
            F.array_join("c.w", " ").alias("chunk_text"),
        )
    )
