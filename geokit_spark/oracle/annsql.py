"""DuckDB oracle SQL for the LSH / IVF similarity operators.

The scalable ANN paths are deterministic: hyperplanes and IVF
centroids come from fixed LCG literals (operators.similarity), and
every dot product is the same float64 left fold on both engines. So
the oracle reproduces the bucket / list assignments EXACTLY — the
driver hash-compares the real scale-path operators, not a crossJoin
stand-in. (Parity rules: oracle/sqlgen docstring; dot-fold parity is
the same one embed_topk already relies on.)
"""

from __future__ import annotations

from ..operators.similarity import (
    EMB_DIM,
    IVF_N_LISTS,
    IVF_N_PROBE,
    N_PLANES,
    N_TABLES,
    _lcg_plane,
    ivf_centroids,
)
from .sqlgen import d
from .textsql import dot_expr, norm_expr


def _vec_literal(vals) -> str:
    return "[" + ",".join(d(float(v)) for v in vals) + "]"


def planes_cte() -> str:
    """(t, w, pv): one row per (table, plane) with the plane's bit
    weight w = 2^p and its literal component list."""
    rows = []
    for t in range(N_TABLES):
        for p in range(N_PLANES):
            vec = [_lcg_plane(t * N_PLANES + p, dim) for dim in range(EMB_DIM)]
            rows.append(f"({t},{1 << p},{_vec_literal(vec)})")
    return f"planes(t, w, pv) AS (VALUES {','.join(rows)})"


def buckets_cte(name: str = "buck", emb: str = "embeddings") -> str:
    """(vec_id, bucket) per (vector, table): bucket = t*2^P + sum of
    set bits — mirrors similarity.lsh_bucket_col bit-for-bit."""
    dot = dot_expr("e.embedding", "pl.pv")
    return f"""
{name} AS (
  SELECT e.vec_id,
    CAST(pl.t * {1 << N_PLANES}
      + SUM(CASE WHEN {dot} > CAST(0.0 AS DOUBLE) THEN pl.w ELSE 0 END)
      AS BIGINT) AS bucket
  FROM {emb} e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.t
)"""


def near_dup_sql(threshold: float = 0.2) -> str:
    """Mirror of similarity.cosine_near_dup: LSH-bucket candidates +
    exact float64 cosine >= threshold."""
    return f"""
WITH {planes_cte()},
{buckets_cte()},
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
n AS (
  SELECT vec_id, embedding, {norm_expr('embedding')} AS nrm FROM embeddings
)
SELECT c.id_a, c.id_b,
  {dot_expr('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS sim
FROM cand c JOIN n a ON a.vec_id = c.id_a JOIN n b ON b.vec_id = c.id_b
WHERE {dot_expr('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= {d(threshold)}
"""


def ann_topk_sql(k: int = 5, probe_bits: int = 1) -> str:
    """Mirror of similarity.ann_topk(probe_bits=1): probes = own bucket
    plus 1-bit-flip buckets; candidates = bucket equijoin; exact
    re-score; deterministic rank tie-broken by neighbor_id."""
    probe_parts = ["SELECT vec_id, bucket FROM buck"]
    for p in range(min(probe_bits, N_PLANES)):
        probe_parts.append(
            f"SELECT vec_id, xor(bucket, {1 << p}) AS bucket FROM buck"
        )
    probes = " UNION ALL ".join(probe_parts)
    return f"""
WITH {planes_cte()},
{buckets_cte()},
probes AS ({probes}),
cand AS (
  SELECT DISTINCT p.vec_id, b.vec_id AS neighbor_id
  FROM probes p JOIN buck b ON p.bucket = b.bucket AND p.vec_id <> b.vec_id
),
n AS (
  SELECT vec_id, embedding, {norm_expr('embedding')} AS nrm FROM embeddings
),
scored AS (
  SELECT c.vec_id, c.neighbor_id,
    {dot_expr('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS sim
  FROM cand c JOIN n a ON a.vec_id = c.vec_id JOIN n b ON b.vec_id = c.neighbor_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id
FROM ranked WHERE rank <= {k}
"""


def cents_cte() -> str:
    cents = ivf_centroids()
    rows = [f"({j},{_vec_literal(cents[j])})" for j in range(IVF_N_LISTS)]
    return f"cents(j, cv) AS (VALUES {','.join(rows)})"


def ivf_topk_sql(k: int = 5, n_probe: int = IVF_N_PROBE) -> str:
    """Mirror of similarity.ivf_topk_fixed: assignment = argmax
    centroid dot (ties -> lower list id, matching the (-dot, list_id)
    struct sort); probes = top-n_probe lists; equijoin on list_id;
    exact re-score."""
    return f"""
WITH {cents_cte()},
dots AS (
  SELECT e.vec_id, c.j, {dot_expr('e.embedding', 'c.cv')} AS dot
  FROM embeddings e CROSS JOIN cents c
),
ranked0 AS (
  SELECT vec_id, j,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dot DESC, j) AS r
  FROM dots
),
assigned AS (SELECT vec_id AS neighbor_id, j AS list_id FROM ranked0 WHERE r = 1),
probes AS (SELECT vec_id, j AS list_id FROM ranked0 WHERE r <= {n_probe}),
cand AS (
  SELECT p.vec_id, a.neighbor_id
  FROM probes p JOIN assigned a USING (list_id)
  WHERE p.vec_id <> a.neighbor_id
),
n AS (
  SELECT vec_id, embedding, {norm_expr('embedding')} AS nrm FROM embeddings
),
scored AS (
  SELECT c.vec_id, c.neighbor_id,
    {dot_expr('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) AS sim
  FROM cand c JOIN n a ON a.vec_id = c.vec_id JOIN n b ON b.vec_id = c.neighbor_id
),
ranked AS (
  SELECT vec_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT vec_id, CAST(rank AS INT) AS rank, neighbor_id
FROM ranked WHERE rank <= {k}
"""
