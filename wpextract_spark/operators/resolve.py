"""Span resolution + translation symmetrization as DataFrame algebra.

Resolution (SURVEY.md §2.4 J3/J6) is a broadcast hash join: explode the span
array, expand each href into its candidate keys (exact-after-preview-strip,
category-slug heuristic), left-join the broadcast registry once per key, take
the first hit by priority, then reassemble the array in original span order.

Symmetrization (J7) is pure relational algebra: resolved edges anti-joined
against their reverses produce the missing back-edges, which are appended and
re-resolved — the reference's resolve -> fix -> resolve sequence
(``extract.py:135-142``) with no iteration (the fixpoint is one round).

Scale notes: the registry side is always broadcast (site-entity cardinality);
the exploded span table is the big side and never shuffles for the joins. The
only shuffle is the groupBy that reassembles arrays, keyed by the row ordinal
— uniform keys, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wpextract_spark.operators.extract import resolve_candidates_udf
from wpextract_spark.sources.entities import ORD


def _dest_struct(prefix: str):
    return F.struct(
        F.col(f"{prefix}.url").alias("link"),
        F.col(f"{prefix}.data_type").alias("data_type"),
        F.col(f"{prefix}.idx").alias("idx"),
    )


def resolve_span_array(df: DataFrame, array_col: str, registry: DataFrame) -> DataFrame:
    """Resolve the ``destination`` of every span in ``df[array_col]``.

    ``array_col`` holds ``array<struct>`` whose element has at least
    ``href`` and ``destination`` fields; already-resolved elements are kept
    as-is (reference ``link_resolver.py:20-24``). Rows are keyed by ``_ord``.
    """
    candidates = resolve_candidates_udf()

    exploded = (
        df.select(ORD, F.posexplode_outer(array_col).alias("pos", "item"))
        .withColumn("_cand", candidates(F.col("item.href")))
    )

    reg_exact = F.broadcast(registry.select(F.struct("url", "data_type", "idx").alias("_r1")))
    reg_heur = F.broadcast(registry.select(F.struct("url", "data_type", "idx").alias("_r2")))

    resolved = (
        exploded.join(reg_exact, F.col("_cand.exact") == F.col("_r1.url"), "left")
        .join(reg_heur, F.col("_cand.heuristic") == F.col("_r2.url"), "left")
        .withColumn(
            "item",
            F.when(
                F.col("item").isNotNull(),
                F.col("item").withField(
                    "destination",
                    # NB: a missed left join leaves _rN null, but F.struct of
                    # null fields is non-null — guard each candidate.
                    F.coalesce(
                        F.col("item.destination"),
                        F.when(F.col("_r1").isNotNull(), _dest_struct("_r1")),
                        F.when(F.col("_r2").isNotNull(), _dest_struct("_r2")),
                    ),
                ),
            ),
        )
    )

    regrouped = resolved.groupBy(ORD).agg(
        F.array_sort(
            F.collect_list(
                F.when(F.col("pos").isNotNull(), F.struct(F.col("pos"), F.col("item")))
            )
        ).alias("_sorted")
    ).select(
        ORD,
        F.transform("_sorted", lambda x: x["item"]).alias(array_col),
    )

    return df.drop(array_col).join(regrouped, ORD, "left")


def symmetrize_translations(posts: DataFrame) -> DataFrame:
    """Append reverse translation edges where A->B exists but B->A does not.

    Mirrors ``extractors/posts.py:179-231``: only *resolved* edges are
    considered; the reverse edge carries ``href = A.link`` and ``lang =
    A.language`` with text/destination null; appended edges need re-resolving.
    Appending order follows the reference's iteration order (source row, then
    span position).
    """
    edges = posts.select(
        F.col(ORD).alias("src_ord"),
        F.col("id").alias("src_id"),
        F.col("link").alias("src_link"),
        F.col("language").alias("src_lang"),
        F.posexplode("translations").alias("pos", "edge"),
    )
    resolved = edges.where(F.col("edge.destination").isNotNull()).select(
        "src_ord", "src_id", "src_link", "src_lang", "pos",
        F.col("edge.destination.idx").alias("dst_id"),
    )
    # The reference indexes posts_df.loc[dst_id]: the destination must be an
    # existing post for a reverse edge to be considered.
    post_ids = posts.select(F.col("id").alias("dst_id"))
    resolved = resolved.join(F.broadcast(post_ids), "dst_id", "left_semi")

    # An edge A->B needs no fix iff some actual edge B->A exists (the
    # reference checks dst's translations for destination.idx == A,
    # posts.py:205-211).
    actual = resolved.select(
        F.col("src_id").alias("r_src"), F.col("dst_id").alias("r_dst")
    )
    missing = resolved.join(
        actual,
        (resolved["dst_id"] == actual["r_src"]) & (resolved["src_id"] == actual["r_dst"]),
        "left_anti",
    )

    new_edges = missing.groupBy("dst_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("src_ord"),
                    F.col("pos"),
                    F.struct(
                        F.lit(None).cast("string").alias("text"),
                        F.col("src_link").alias("href"),
                        F.lit(None)
                        .cast("struct<link:string,data_type:string,idx:bigint>")
                        .alias("destination"),
                        F.col("src_lang").alias("lang"),
                    ).alias("edge"),
                )
            )
        ).alias("_new_sorted")
    ).select(
        F.col("dst_id").alias("id"),
        F.transform("_new_sorted", lambda x: x["edge"]).alias("_new_translations"),
    )

    return posts.join(F.broadcast(new_edges), "id", "left").withColumn(
        "translations",
        F.when(
            F.col("translations").isNotNull(),
            F.concat(
                F.col("translations"),
                F.coalesce(F.col("_new_translations"), F.array().cast("array<struct<text:string,href:string,destination:struct<link:string,data_type:string,idx:bigint>,lang:string>>")),
            ),
        ).otherwise(F.col("_new_translations")),
    ).drop("_new_translations")
