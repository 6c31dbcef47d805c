"""geokit_spark.metrics pure-function tests (no Spark session —
the REST-backed snapshot path is exercised by bench.py itself)."""

from geokit_spark import metrics


def _snap(**kw):
    d = {f: 0 for f in ("shuffle_write", "shuffle_read", "input",
                        "output", "py_sent", "py_returned")}
    d["available"] = True
    d.update(kw)
    return d


def test_parse_total_formats():
    f = "total (min, med, max (stageId: taskId))\n807.1 KiB (100.9 KiB, 100.9 KiB, 100.9 KiB (stage 3.0: task 15))"
    assert metrics._parse_total(f) == int(807.1 * 1024)
    assert metrics._parse_total("header\n2.0 GiB (...)") == 2 * 1024**3
    assert metrics._parse_total("header\n17 B (...)") == 17
    assert metrics._parse_total("no sizes here") == 0
    # the size must come from a later line, not the header
    assert metrics._parse_total("64.0 MiB header-only") == 0


def test_delta_clamps_and_propagates_availability():
    a = _snap(shuffle_write=100, py_sent=50)
    b = _snap(shuffle_write=300, py_sent=40)  # py_sent regressed (evict)
    d = metrics.delta(a, b)
    assert d["shuffle_write"] == 200
    assert d["py_sent"] == 0  # clamped, never negative
    assert d["available"]
    b2 = dict(b, available=False)
    assert not metrics.delta(a, b2)["available"]


def test_per_run_and_moved_bytes():
    d = _snap(shuffle_write=90, shuffle_read=90, input=30,
              py_sent=60, py_returned=30)
    p = metrics.per_run(d, 3)
    assert p["shuffle_write"] == 30 and p["py_sent"] == 20
    assert metrics.per_run(d, 0)["input"] == 30  # guard: n_runs >= 1
    # moved = shuffle both directions + input + Arrow both directions
    assert metrics.moved_bytes(d) == 90 + 90 + 30 + 60 + 30


def test_bytecounter_unavailable_without_ui():
    class FakeSC:
        uiWebUrl = None
        applicationId = "app"

    class FakeSpark:
        sparkContext = FakeSC()

    c = metrics.ByteCounter(FakeSpark())
    s = c.snapshot()
    assert not s["available"] and s["shuffle_write"] == 0
