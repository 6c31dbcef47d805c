"""Geometry normalization kernels (reference geom.py shift /
divideMultipolygonIntoEasternAndWesternPart / fixOutOfBoundsGeoms /
applyBuffer)."""

import pytest

from geokit_spark.kernels.geom_ops import signed_area
from geokit_spark.kernels.normalize import (
    apply_buffer_safe, divide_east_west, fix_out_of_bounds, shift_ring,
)


def _sq(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


def test_shift_ring():
    assert shift_ring(_sq(0, 0, 1, 1), 10.0, -5.0) == _sq(10, -5, 11, -4)
    # closing duplicate dropped
    r = _sq(0, 0, 1, 1) + [(0.0, 0.0)]
    assert len(shift_ring(r)) == 4


def test_divide_east_west():
    w = _sq(-179, 0, -178, 1)
    e = _sq(178, 0, 179, 2)
    mid = _sq(177, 0, 178, 1)
    left, right = divide_east_west([w, e, mid])
    # sorted by minx: w | gap | mid, e -> right (<= split) = {w}
    assert len(right) == 1 and right[0][0][0] == -179
    assert len(left) == 2
    # 'main' picks the larger total area side (e + mid = 3 > w = 1)
    main = divide_east_west([w, e, mid], side="main")
    assert len(main) == 2
    with pytest.raises(ValueError):
        divide_east_west([_sq(175, 0, 185, 1)])
    with pytest.raises(ValueError):
        divide_east_west([w], side="sideways")


def test_fix_out_of_bounds_antimeridian():
    ring = _sq(170, 10, 190, 20)  # protrudes 10 deg past +180
    out = fix_out_of_bounds([ring], how="shift")
    assert len(out) == 2
    areas = sorted(abs(signed_area(r)) for r in out)
    assert areas == [pytest.approx(100.0), pytest.approx(100.0)]
    xs_all = [x for r in out for x, _ in r]
    assert min(xs_all) >= -180.0 and max(xs_all) <= 180.0
    # clip mode drops the protrusion
    out_clip = fix_out_of_bounds([ring], how="clip")
    assert len(out_clip) == 1
    assert abs(signed_area(out_clip[0])) == pytest.approx(100.0)
    # in-bounds ring passes through untouched
    assert fix_out_of_bounds([_sq(0, 0, 1, 1)]) == [_sq(0, 0, 1, 1)]


def test_fix_out_of_bounds_pole_fold():
    ring = _sq(10, 85, 20, 95)  # protrudes 5 deg past the north pole
    out = fix_out_of_bounds([ring], how="shift")
    assert len(out) == 2
    ys_all = [y for r in out for _, y in r]
    assert max(ys_all) <= 90.0
    # folded piece lands on the opposite side of the globe (~-165 lon
    # after the [-180,180] re-wrap of the reference's 0..360 frame)
    folded = min(out, key=lambda r: min(x for x, _ in r))
    assert max(x for x, _ in folded) <= -160.0
    # fold preserves area up to the 1e-6-deg pole clamp
    total = sum(abs(signed_area(r)) for r in out)
    assert total == pytest.approx(100.0, rel=1e-5)


def test_apply_buffer_safe_antimeridian():
    ring = _sq(178.5, 10, 179.5, 11)
    out = apply_buffer_safe(ring, 1.0)
    assert len(out) == 2  # buffer crosses +180 and wraps
    xs_all = [x for r in out for x, _ in r]
    assert min(xs_all) >= -180.0 and max(xs_all) <= 180.0
    total = sum(abs(signed_area(r)) for r in out)
    # grown area must exceed the original square
    assert total > 1.0
    # interior case: plain single-ring buffer
    out2 = apply_buffer_safe(_sq(0, 0, 1, 1), 0.5)
    assert len(out2) == 1 and abs(signed_area(out2[0])) > 1.0
