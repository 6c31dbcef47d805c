"""Extent grid arithmetic (reference extent.py:513-983 semantics)."""

import pytest

from geokit_spark.extent import Extent


def test_fit_grow_and_shrink():
    e = Extent(0.3, 0.2, 4.7, 3.8)
    g = e.fit(1.0)
    assert (g.xmin, g.ymin, g.xmax, g.ymax) == (0.0, 0.0, 5.0, 4.0)
    s = e.fit(1.0, grow=False)
    assert (s.xmin, s.ymin, s.xmax, s.ymax) == (1.0, 1.0, 4.0, 3.0)


def test_fits_resolution():
    assert Extent(0, 0, 4, 2).fits_resolution(1.0)
    assert Extent(0, 0, 4, 2).fits_resolution((2.0, 1.0))
    assert not Extent(0, 0, 4.5, 2).fits_resolution(1.0)


def test_overlaps_contains():
    a = Extent(0, 0, 10, 10)
    b = Extent(2, 2, 5, 5)
    c = Extent(10, 10, 12, 12)  # corner touch: not overlapping (open)
    assert a.overlaps(b) and not a.overlaps(c)
    assert a.contains(b)
    assert a.contains(b, res=1.0)
    assert not a.contains(Extent(2.5, 2, 5.5, 5), res=1.0)
    assert not b.contains(a)


def test_find_within_y_at_top():
    outer = Extent(0, 0, 10, 10)
    inner = Extent(2, 3, 6, 8)
    xoff, yoff, xwin, ywin = outer.find_within(inner, 1.0)
    assert (xoff, yoff, xwin, ywin) == (2, 2, 4, 5)
    xoff, yoff, xwin, ywin = outer.find_within(inner, 1.0, y_at_top=False)
    assert (xoff, yoff, xwin, ywin) == (2, 3, 4, 5)


def test_contains_loc():
    e = Extent(0, 0, 1, 1)
    assert e.contains_loc(0.5, 0.5) and e.contains_loc(0, 1)
    assert not e.contains_loc(1.1, 0.5)


def test_pad():
    e = Extent(1, 1, 2, 2).pad(0.5)
    assert (e.xmin, e.ymin, e.xmax, e.ymax) == (0.5, 0.5, 2.5, 2.5)
