"""operators.pipeline.corpus_funnel — the end-to-end funnel: dedup
collapse, quality-gate rejection, and zone rollup consistency."""

import pytest
from pyspark.sql import functions as F

from geokit_spark.operators.pipeline import corpus_funnel


@pytest.fixture(scope="module")
def spark():
    from geokit_spark.session import get_spark

    return get_spark("test-pipeline", cores=4, shuffle_partitions=4)


def _crawl(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


GOOD = "the " + " ".join(f"word{i:02d}" for i in range(19))  # passes gate


def test_funnel_collapses_revisits_and_rejects(spark):
    rows = [
        (1, GOOD, "en", "s0"),
        (1_000_001, GOOD, "en", "s0"),   # revisit: same text, new url
        (2, "tiny doc", "en", "s0"),      # rejected: too_short
    ]
    out = corpus_funnel(spark, _crawl(spark, rows)).collect()
    # doc 2 rejected, docs {1, 1000001} collapse to canonical 1 ->
    # every surviving row counts that single canonical exactly once
    # (overlapping zones may each emit a row — inner-join semantics)
    from geokit_spark.operators import spatial_join

    want_zones = {
        r.zone_id
        for r in spatial_join.docs_join_zones(
            spark, _crawl(spark, rows[:1]).select("doc_id")
        ).collect()
    }
    assert {r.zone_id for r in out} == want_zones
    for r in out:
        assert r.lang == "en" and r.n_docs == 1 and r.sum_words == 20


def test_funnel_zone_rollup_matches_direct_join(spark):
    """The funnel's rollup equals geocoding the unique passing docs
    directly — proves the page-table/extract/url roundtrip changes
    nothing."""
    from geokit_spark.operators import spatial_join

    rows = [(i, GOOD + f" tail{i}", "en", f"s{i % 3}") for i in range(60)]
    out = corpus_funnel(spark, _crawl(spark, rows)).collect()
    docs = _crawl(spark, rows).select("doc_id")
    direct = (
        spatial_join.docs_join_zones(spark, docs)
        .groupBy("zone_id")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )
    assert {(r.zone_id, r.n_docs) for r in out} == {
        (r.zone_id, r.n_docs) for r in direct
    }
