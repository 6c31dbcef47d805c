"""Adaptive resolution refinement: refined join must equal unrefined
(both equal brute force)."""

from geokit_spark.operators import spatial_join


def test_refined_join_equals_unrefined(spark, docs):
    base = (
        spatial_join.docs_join_zones(spark, docs, refine=False)
        .select("doc_id", "zone_id")
        .toPandas()
    )
    ref = (
        spatial_join.docs_join_zones(spark, docs, refine=True)
        .select("doc_id", "zone_id")
        .toPandas()
    )
    a = set(map(tuple, base.values.tolist()))
    b = set(map(tuple, ref.values.tolist()))
    assert a == b
    assert len(base) == len(ref)  # no duplicates from the three-way union


def test_fine_map_classes_sane():
    from geokit_spark.kernels.cells import BOUNDARY, IN
    from geokit_spark.operators.spatial_join import (
        _poly_candidates_pdf,
        _poly_fine_pdf,
        zones_dict,
    )

    pdf = _poly_fine_pdf(zones_dict())
    assert set(pdf["fine_class"].unique()) <= {IN, BOUNDARY}
    # refinement must shrink the boundary band: fine boundary cells per
    # zone << 64x the coarse boundary cells
    coarse = _poly_candidates_pdf(zones_dict())
    n_coarse_bnd = (coarse.cell_class == BOUNDARY).sum()
    n_fine_bnd = (pdf.fine_class == BOUNDARY).sum()
    assert n_fine_bnd < n_coarse_bnd * 64 * 0.35
