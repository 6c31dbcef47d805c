"""The end-to-end corpus-build funnel over the input_hint page table.

One function, used verbatim by BOTH the driver query
(``__spark_entry__.q_corpus_pipeline``) and the bench stage, so the
measured pipeline and the oracle-verified pipeline are the same code:

  crawl docs -> page table (url, warc_ts, html, text, lang)
        -> byte-level main-text extraction (Arrow, lang passthrough)
        -> doc ids parsed BACK from the url (template roundtrip)
        -> C4/Gopher quality gate ON THE EXTRACTED TEXT
        -> exact content dedup (min-doc_id canonical per md5 group)
        -> geocode + zone spatial join of the canonicals
        -> per (zone_id, lang) rollup

Scale shape: the funnel is JOIN-FREE until the broadcast zones join —
lang rides the extractor batch, text rides the quality gate, and the
canonical's attributes fold into the dedup aggregation (min_by), so
the whole five-stage pipeline runs in 2 shuffles (md5 group + final
rollup) with 0 sort-merge joins (see PLANS.md `corpus_pipeline`).

Reference parity anchor: composes the reference's extractFeatures /
RegionMask workflow (`/root/reference/geokit/core/vector.py:365-434`,
`regionmask.py:1409-1662`) with the corpus-curation stages the
training-data mandate adds on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def corpus_funnel(spark: SparkSession, crawl: DataFrame) -> DataFrame:
    """(zone_id, lang, n_docs, sum_words) for the deduped, quality-
    gated, zone-joined corpus built from ``crawl``
    (doc_id, text, lang, source). Duplicate texts (revisits, mirrors)
    collapse to the min-doc_id canonical before the spatial join."""
    from ..functions.url import url_path_id
    from ..sources.pages import extract_text, pages_from_docs
    from . import spatial_join
    from .quality import quality_filter

    pages = pages_from_docs(crawl)
    # r8 note: promoting the all-JVM extract_text_sql here was MEASURED
    # 40x SLOWER (231 s vs 6.2 s at 800k pages): the extraction is a
    # pure expression tree, so CollapseProject inlines it into every
    # downstream reference to `text` — the quality gate reads text ~6
    # times and the physical plan carried 11 copies of the regex chain.
    # The Arrow kernel is a hard materialization boundary: text is
    # computed once and referenced as a column. The ~230 MB/run Python
    # crossing is the cheaper trade by far; extract_text_sql stays the
    # right engine only where its output is referenced once
    # (mirror_clusters, the html_extract_sql bench stage).
    # as_string: the extraction emits utf8 directly (same bytes), so
    # no decode(, 'UTF-8') expression exists for CollapseProject to
    # inline into the quality gate's many text references (r8: the
    # binary+decode shape carried 11 decode copies in the plan)
    parsed = extract_text(
        pages, passthrough=("lang",), as_string=True
    ).select(
        url_path_id(F.col("url")).alias("doc_id"),
        F.col("text_extracted").alias("text"),
        "lang",
    )
    kept = (
        quality_filter(parsed, passthrough=("text", "lang"))
        .filter(F.col("keep"))
        .select("doc_id", "text", "lang", "n_words")
    )
    canon = (
        kept.groupBy(F.md5(F.col("text")).alias("text_md5"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min_by("lang", "doc_id").alias("lang"),
            F.min("n_words").alias("n_words"),
        )
        .select("doc_id", "lang", "n_words")
    )
    return (
        spatial_join.docs_join_zones(spark, canon)
        .groupBy("zone_id", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").cast("long").alias("sum_words"),
        )
    )
