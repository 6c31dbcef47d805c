"""Randomized equivalence hunt for the distributed sieve contract.

_sieve_merge_distributed's claim is that its per-round parallel merge
sets (DONE / pinned-hub ORDER-FREE / DISTANCE-2 order minima) are
order-exchangeable with the sequential smallest-first loop — i.e. the
two executions are bit-identical on EVERY component graph, not just
the adversarial fixtures. Spark makes per-example property testing
impractically slow, so this file re-states the distributed round
rules as a pure-python mirror (`_mirror_rounds`, written join-for-
join against operators/components._sieve_merge_distributed — every
aggregate, filter, tie-break and rewire) and hypothesis-searches for
a counterexample graph against the REAL `_sieve_merge_driver`. The
mirror<->Spark fidelity is pinned separately by the adversarial-graph
and 1e5-component-raster tests in test_components.py, which run the
actual Spark fixpoint; a counterexample found HERE would be an
algorithm bug shared by both.
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from geokit_spark.operators.components import _sieve_merge_driver


def _mirror_rounds(comp_rows, adj_pairs, min_size, max_rounds=256):
    """Pure-python re-statement of _sieve_merge_distributed's round
    rules over plain dicts. comp_rows: [(root, value, n, pix)];
    adj_pairs: {(ra, rb)} with ra < rb. Returns [(value, n_pixels)]
    sorted by value."""
    comp = {
        r: {"value": v, "n": n, "n0": n, "pix": p,
            "pending": n < min_size}
        for r, v, n, p in comp_rows
    }
    adj = {tuple(sorted(e)) for e in adj_pairs}

    def nbrs_of():
        out = {}
        for a, b in adj:
            out.setdefault(a, set()).add(b)
            out.setdefault(b, set()).add(a)
        return out

    for _ in range(max_rounds):
        pend = [r for r in comp if comp[r]["pending"]]
        if not pend:
            break
        w_total = sum(comp[r]["n"] for r in pend)
        nbrs = nbrs_of()

        # --- per-pending neighbor aggregates (nbq / per_src / n2) ---
        per_src = {}
        for s in pend:
            bs = nbrs.get(s, ())
            if not bs:
                continue  # inner join on adj: no row
            t1 = max(
                (comp[b]["n"], -comp[b]["pix"], b, comp[b]["pending"])
                for b in bs
            )
            any_pend = any(comp[b]["pending"] for b in bs)
            n2 = max(
                (comp[b]["n"] for b in bs if b != t1[2]), default=None
            )
            sn = comp[s]["n"]
            pinned = (sn >= min_size) or (
                (not any_pend)
                and t1[0] > (n2 if n2 is not None else -1) + w_total
            )
            per_src[s] = (sn, t1, pinned)

        okey = {s: (comp[s]["n0"], comp[s]["pix"]) for s in pend}

        # kbad per hub: min okey over NON-pinned pending srcs adjacent
        kbad = {}
        for s in pend:
            if s not in per_src or per_src[s][2]:
                continue
            for b in nbrs[s]:
                k = okey[s]
                if b not in kbad or k < kbad[b]:
                    kbad[b] = k

        # ORDER-FREE set
        s_of = set()
        for s, (sn, t1, pinned) in per_src.items():
            if pinned and sn < min_size and not t1[3]:
                hub = t1[2]
                if hub not in kbad or okey[s] < kbad[hub]:
                    s_of.add(s)

        # DISTANCE-2 order-minimal set
        pmin1 = {}
        for a, bs in nbrs.items():
            ks = [okey[b] for b in bs if comp[b]["pending"]]
            if ks:
                pmin1[a] = min(ks)
        kmin = {}
        for a, bs in nbrs.items():
            cands = [pmin1[a]] if a in pmin1 else []
            cands += [pmin1[b] for b in bs if b in pmin1]
            if cands:
                kmin[a] = min(cands)
        s_d2 = {
            s
            for s in pend
            if s in per_src
            and per_src[s][0] < min_size
            and (s not in kmin or okey[s] <= kmin[s])
        }

        mergers = s_of | s_d2
        targets = {s: per_src[s][1][2] for s in mergers}

        # done in place: grown or isolated
        done = {
            r for r in pend
            if comp[r]["n"] >= min_size or r not in nbrs
        }

        moved = {}
        for s, dst in targets.items():
            moved[dst] = moved.get(dst, 0) + comp[s]["n"]
        for s in targets:
            del comp[s]
        for dst, mn in moved.items():
            comp[dst]["n"] += mn
        for r in done:
            if r in comp:  # done and mergers are disjoint by design
                comp[r]["pending"] = False

        new_adj = set()
        for a, b in adj:
            a2 = targets.get(a, a)
            b2 = targets.get(b, b)
            if a2 != b2:
                new_adj.add(tuple(sorted((a2, b2))))
        adj = new_adj
    else:
        raise RuntimeError("mirror did not drain pending")

    totals = {}
    for r in comp.values():
        totals[r["value"]] = totals.get(r["value"], 0) + r["n"]
    return sorted(totals.items())


def _driver_totals(comp_rows, adj_pairs, min_size):
    comp = pd.DataFrame(
        comp_rows, columns=["root", "value", "n", "pix"]
    ).astype({"root": "int64", "value": "float64", "n": "int64",
              "pix": "int64"})
    adj = pd.DataFrame(
        sorted(adj_pairs), columns=["ra", "rb"]
    ).astype("int64") if adj_pairs else pd.DataFrame(
        {"ra": pd.Series(dtype="int64"), "rb": pd.Series(dtype="int64")}
    )
    out = _sieve_merge_driver(comp, adj, min_size)
    return list(zip(out["value"].tolist(),
                    [int(v) for v in out["n_pixels"].tolist()]))


@st.composite
def _graphs(draw):
    n = draw(st.integers(min_value=2, max_value=26))
    min_size = draw(st.integers(min_value=2, max_value=9))
    sizes = draw(
        st.lists(st.integers(min_value=1, max_value=12),
                 min_size=n, max_size=n)
    )
    # unique pix ids in a shuffled order (the global tie-break key)
    pix = draw(st.permutations(list(range(100, 100 + n))))
    # values unique per component: per-value totals then reveal every
    # merge's target exactly (maximal sensitivity)
    comp_rows = [
        (i, float(i), sizes[i], pix[i]) for i in range(n)
    ]
    possible = [(a, b) for a in range(n) for b in range(a + 1, n)]
    edges = draw(
        st.lists(st.sampled_from(possible), max_size=3 * n, unique=True)
    ) if possible else []
    return comp_rows, set(edges), min_size


@settings(max_examples=500, deadline=None)
@given(_graphs())
def test_distributed_rules_match_sequential_on_random_graphs(g):
    comp_rows, edges, min_size = g
    assert _mirror_rounds(comp_rows, edges, min_size) == _driver_totals(
        comp_rows, edges, min_size
    )


def test_mirror_matches_driver_on_the_spark_adversarial_fixture():
    """Anchor the mirror to the same generator test_components.py runs
    through the REAL Spark fixpoint — if the mirror and the Spark
    implementation ever drift, this shared fixture plus the Spark-side
    test triangulates which one moved."""
    import numpy as np

    from tests.test_components import _adversarial_graph

    for seed in range(6):
        rng = np.random.default_rng(seed)
        comp, adj = _adversarial_graph(rng)
        rows = [
            (int(r.root), float(r.value), int(r.n), int(r.pix))
            for r in comp.itertuples()
        ]
        edges = {(int(r.ra), int(r.rb)) for r in adj.itertuples()}
        assert _mirror_rounds(rows, edges, 5) == _driver_totals(
            rows, edges, 5
        )


def test_mirror_rejects_nontermination():
    with pytest.raises(RuntimeError, match="drain"):
        _mirror_rounds(
            [(0, 0.0, 1, 100), (1, 1.0, 1, 101)], {(0, 1)}, 5,
            max_rounds=0,
        )
