"""DuckDB oracle SQL for the web-graph / url workload
(sources/pages.pages_multicrawl, pages_with_links;
operators/webgraph; functions/url).

These oracles are INDEPENDENT closed forms, not expression mirrors:
the builders place every url variant / out-link by an arithmetic rule
on doc_id, so the oracle derives the expected answer straight from
``documents`` — revision counts from divisibility, canonical/surt
cardinalities from which cosmetic variants collapse, link targets
from the (doc_id * P[j] + j) % n formula — while the Spark side EARNS
the same numbers by actually building the strings/bytes, parsing them
back, canonicalizing, and (for PageRank) iterating distributed joins.
Any defect in the builder, the byte parser, the canonicalizer, or the
join/agg plan shows up as a value-hash mismatch.

Parity notes: all compared values are int64 (counts, epoch sums,
truncating-division PageRank scores) — order-independent under
partial aggregation on both engines. DuckDB ``//`` and Spark ``div``
are both truncating integer division (identical on the non-negative
operands used here).
"""

from __future__ import annotations

from ..operators.webgraph import DAMP_DEN, DAMP_NUM, PR_BASE, PR_SCALE
from ..sources.pages import CRAWL_STRIDE, LINK_MULTS, WARC_EPOCH

# per-doc revision arithmetic: crawl c present iff c=0 or doc_id%(c+1)=0
_REVS = (
    "1 + CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END"
    " + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END"
)
_KEPT_REV = (
    "CASE WHEN doc_id % 3 = 0 THEN 2"
    " WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END"
)


def url_filter_sql(blocked_net: bool = True) -> str:
    """Blocklist anti-join mirror: kept pages per lang. The blocklist
    is every '.net' domain plus src0.example and src1.co.uk; a doc's
    host suffix class is (doc_id%9) div 3 and ALL its crawl revisions
    (incl. the case/port and www. url variants) share the registrable
    domain, so kept pages = SUM(revs) over unblocked docs — any
    failure of the Spark-side parser to fold a variant into the same
    domain shifts the count."""
    return f"""
WITH per_doc AS (
  SELECT lang, source, (doc_id % 9) // 3 AS sfx,
    {_REVS} AS revs
  FROM documents
)
SELECT lang, CAST(SUM(revs) AS BIGINT) AS n_pages
FROM per_doc
WHERE NOT (sfx = 2
           OR (source = 'src0' AND sfx = 0)
           OR (source = 'src1' AND sfx = 1))
GROUP BY lang
"""


def domain_cap_sql(k: int = 5) -> str:
    """cap_per_domain mirror: enumerate every crawl revision row with
    its exact epoch (WARC_EPOCH + doc_id + crawl*STRIDE — unique per
    row, so the warc_ts order is total and the url tiebreak never
    fires), rank per domain, keep k earliest. epoch_sum pins WHICH
    rows were kept, not just how many."""
    return f"""
WITH rows_ AS (
  SELECT
    source || CASE (doc_id % 9) // 3
      WHEN 0 THEN '.example' WHEN 1 THEN '.co.uk' ELSE '.net' END
      AS domain,
    {WARC_EPOCH} + doc_id + c.crawl * {CRAWL_STRIDE} AS epoch
  FROM documents, (VALUES (0), (1), (2)) AS c(crawl)
  WHERE c.crawl = 0 OR doc_id % (c.crawl + 1) = 0
),
ranked AS (
  SELECT domain, epoch,
    ROW_NUMBER() OVER (PARTITION BY domain ORDER BY epoch ASC) AS rk
  FROM rows_
)
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_kept,
  CAST(SUM(epoch) AS BIGINT) AS epoch_sum
FROM ranked WHERE rk <= {k}
GROUP BY domain
"""


def url_canonical_sql() -> str:
    """Cardinality collapse per lang: every crawl row has a distinct
    raw url; canonicalization merges the case/port/fragment variant
    (crawl 1) into the base; the SURT key merges all three (scheme +
    www dropped). So n_raw = revisions, n_canon = 1 + [doc%3=0],
    n_surt = 1 per doc."""
    return f"""
WITH per_doc AS (
  SELECT lang,
    {_REVS} AS revs,
    1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS canon
  FROM documents
)
SELECT lang,
  CAST(SUM(revs) AS BIGINT) AS n_rows,
  CAST(SUM(revs) AS BIGINT) AS n_raw,
  CAST(SUM(canon) AS BIGINT) AS n_canon,
  CAST(COUNT(*) AS BIGINT) AS n_surt
FROM per_doc GROUP BY lang
"""


def pages_latest_sql() -> str:
    """Latest-revision-wins dedup on the SURT key: the kept revision
    is the highest crawl index present (epochs stride by
    CRAWL_STRIDE, so max epoch <=> max crawl)."""
    return f"""
WITH per_doc AS (
  SELECT lang, doc_id,
    {_REVS} AS revs,
    {_KEPT_REV} AS kept_rev
  FROM documents
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_urls,
  CAST(SUM(revs) AS BIGINT) AS n_revisions,
  CAST(SUM({WARC_EPOCH} + doc_id + kept_rev * {CRAWL_STRIDE}) AS BIGINT)
    AS sum_kept_epoch,
  CAST(SUM(kept_rev) AS BIGINT) AS sum_kept_rev
FROM per_doc GROUP BY lang
"""


def host_domains_sql() -> str:
    """Registrable-domain rollup over every crawl row. The domain is
    source || suffix(doc_id%3) — ``www.`` (crawl 2) must be folded in
    by the Spark-side registrable_domain. html bytes re-derive the
    template length (pagesql parity) + 8 bytes per ' (rev c)'
    suffix on each non-base revision."""
    esc = (
        "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;')"
    )
    # keep in sync with sources/pages._PRE/_MID1/_MID2/_POST
    base_len = (
        f"strlen('<!doctype html><html><head><title>' || source || ' #' ||"
        f" CAST(doc_id AS VARCHAR) || '</title></head><body><h1>' || source ||"
        f" '</h1><p>' || {esc} ||"
        f" '</p><footer>crawl</footer></body></html>')"
    )
    return f"""
WITH per_doc AS (
  SELECT
    source || CASE (doc_id % 9) // 3
      WHEN 0 THEN '.example' WHEN 1 THEN '.co.uk' ELSE '.net' END AS domain,
    lang, doc_id,
    {_REVS} AS revs,
    {base_len} AS base_len
  FROM documents
)
SELECT domain,
  CAST(SUM(revs) AS BIGINT) AS n_pages,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(SUM(revs * base_len + 8 * (revs - 1)) AS BIGINT) AS html_bytes
FROM per_doc GROUP BY domain
"""


def snapshot_reads_sql() -> str:
    """Closed form for the snapshot protocol row: version v holds the
    doc_id % 3 < v slices; the incremental read between v-1 and v is
    exactly the % 3 = v-1 slice."""
    return """
SELECT version,
  CAST(SUM(CASE WHEN doc_id % 3 < version THEN 1 ELSE 0 END) AS BIGINT)
    AS n_rows,
  CAST(SUM(CASE WHEN doc_id % 3 < version THEN doc_id ELSE 0 END) AS BIGINT)
    AS sum_doc_id,
  CAST(COUNT(DISTINCT CASE WHEN doc_id % 3 < version THEN lang END)
    AS BIGINT) AS n_langs,
  CAST(SUM(CASE WHEN doc_id % 3 = version - 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS inc_rows
FROM documents CROSS JOIN (VALUES (1), (2), (3)) t(version)
GROUP BY version
"""


def host_locality_sql(geocode_cte: str, grid_exprs) -> str:
    """Geo x web fusion: dominant analysis-grid cell per registrable
    domain over all crawl rows (deterministic tie-break: higher count,
    then lower cell id). geocode_cte/grid_exprs come from
    oracle/sqlgen so the geocoder arithmetic stays single-sourced."""
    gx, gy = grid_exprs
    from ..constants import GRID_N

    return f"""
WITH {geocode_cte},
per_doc AS (
  SELECT
    source || CASE (doc_id % 9) // 3
      WHEN 0 THEN '.example' WHEN 1 THEN '.co.uk' ELSE '.net' END AS domain,
    doc_id,
    {_REVS} AS revs
  FROM documents
),
cells AS (
  SELECT p.domain,
    CAST({gx} AS BIGINT) * {GRID_N} + CAST({gy} AS BIGINT) AS cell,
    p.revs
  FROM per_doc p JOIN geo g USING (doc_id)
),
per_cell AS (
  SELECT domain, cell, CAST(SUM(revs) AS BIGINT) AS cnt
  FROM cells GROUP BY domain, cell
),
ranked AS (
  SELECT domain, cell, cnt,
    ROW_NUMBER() OVER (
      PARTITION BY domain ORDER BY cnt DESC, cell ASC) AS rn
  FROM per_cell
)
SELECT s.domain,
  CAST(s.n_pages AS BIGINT) AS n_pages,
  CAST(s.n_cells AS BIGINT) AS n_cells,
  r.cell AS top_cell,
  r.cnt AS top_cell_n
FROM (
  SELECT domain, SUM(cnt) AS n_pages, COUNT(*) AS n_cells
  FROM per_cell GROUP BY domain
) s JOIN ranked r ON r.domain = s.domain AND r.rn = 1
"""


def _edges_cte() -> str:
    mult_case = " ".join(
        f"WHEN {j} THEN {m}" for j, m in enumerate(LINK_MULTS)
    )
    return f"""
n AS (SELECT COUNT(*) AS c FROM documents),
edges AS (
  SELECT d.doc_id AS src_id,
    (d.doc_id * CASE j {mult_case} ELSE 0 END + d.doc_id // 7 + j)
      % (SELECT c FROM n) AS dst_id,
    d.lang, d.source
  FROM documents d CROSS JOIN (VALUES (0),(1),(2),(3)) t(j)
  WHERE j <= d.doc_id % 4
)"""


def link_depth_sql(max_depth: int = 4, seed_mod: int = 23) -> str:
    """BFS mirror: chained min-union CTEs over the formula-regenerated
    edge set — round t takes, per node, the MIN of its round-t-1
    depth and (neighbor depth + 1). That full relaxation equals the
    Spark side's frontier-only expansion exactly because every hop
    costs 1. Per-depth doc_id sums pin WHICH nodes sit at each level,
    not just how many."""
    cte = [_edges_cte().strip()]
    cte.append(
        f"d0 AS (SELECT doc_id, 0 AS depth FROM documents"
        f" WHERE doc_id % {seed_mod} = 0)"
    )
    for t in range(1, max_depth + 1):
        cte.append(f"""
d{t} AS (
  SELECT doc_id, MIN(depth) AS depth FROM (
    SELECT doc_id, depth FROM d{t - 1}
    UNION ALL
    SELECT e.dst_id AS doc_id, p.depth + 1 AS depth
    FROM edges e JOIN d{t - 1} p ON p.doc_id = e.src_id
  ) GROUP BY doc_id
)""")
    return f"""
WITH {",".join(cte)}
SELECT CAST(depth AS INT) AS depth,
  CAST(COUNT(*) AS BIGINT) AS n_nodes,
  CAST(SUM(doc_id) AS BIGINT) AS doc_sum
FROM d{max_depth} GROUP BY depth
"""


def noindex_filter_sql() -> str:
    """filter_noindex mirror over pages_with_meta: the builder's
    arithmetic says noindex holds iff doc_id%11=7 (UPPERCASE flipped
    variant) or doc_id%7=3; the benign 'index, follow' rows
    (doc_id%7=5, not %11=7) MUST survive — a substring-matching
    parser drops them and breaks both aggregates."""
    return """
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_kept,
  CAST(SUM(doc_id) AS BIGINT) AS doc_sum
FROM documents
WHERE NOT (doc_id % 11 = 7 OR doc_id % 7 = 3)
GROUP BY lang
"""


def _domain_case(id_expr: str, source_expr: str) -> str:
    """registrable domain of a doc's host0 url: source || suffix class
    (doc_id%9)//3 — single-sourced for every host-level oracle."""
    return (
        f"{source_expr} || CASE ({id_expr} % 9) // 3"
        " WHEN 0 THEN '.example' WHEN 1 THEN '.co.uk' ELSE '.net' END"
    )


def anchor_stats_sql() -> str:
    """extract_anchors mirror: the builder writes anchor text
    'a<(src+dst)%7>' into every nav link, so the per-anchor-class
    rollup (count, distinct targets, dst sum) is a closed form over
    the formula edges while the Spark side byte-parses the spans back
    out of the html."""
    return f"""
WITH {_edges_cte()}
SELECT 'a' || CAST((src_id + dst_id) % 7 AS VARCHAR) AS anchor,
  CAST(COUNT(*) AS BIGINT) AS n_links,
  CAST(COUNT(DISTINCT dst_id) AS BIGINT) AS n_dst,
  CAST(SUM(dst_id) AS BIGINT) AS dst_sum
FROM edges GROUP BY 1
"""


def host_graph_sql() -> str:
    """host_graph mirror: endpoint domains from the host0 arithmetic
    (src side straight off the edge row, dst side through the
    documents join — same join the Spark plan pays against the page
    table), rolled up per src_domain."""
    src_dom = _domain_case("e.src_id", "e.source")
    dst_dom = _domain_case("e.dst_id", "d.source")
    return f"""
WITH {_edges_cte()},
e2 AS (
  SELECT {src_dom} AS src_domain, {dst_dom} AS dst_domain, e.dst_id
  FROM edges e JOIN documents d ON d.doc_id = e.dst_id
)
SELECT src_domain,
  CAST(COUNT(*) AS BIGINT) AS n_links,
  CAST(SUM(CASE WHEN dst_domain <> src_domain THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cross,
  CAST(COUNT(DISTINCT dst_domain) AS BIGINT) AS n_dst_domains,
  CAST(SUM(dst_id) AS BIGINT) AS dst_sum
FROM e2 GROUP BY src_domain
"""


def page_links_sql() -> str:
    """Per-lang link-graph audit against the formula-regenerated edge
    set (the Spark side parses the SAME edges out of the html
    bytes)."""
    return f"""
WITH {_edges_cte()}
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_edges,
  CAST(COUNT(DISTINCT dst_id) AS BIGINT) AS n_dst,
  CAST(SUM((src_id * 1009 + dst_id * 31) % 999983) AS BIGINT) AS checksum
FROM edges GROUP BY lang
"""


def pagerank_sql(iters: int = 3) -> str:
    """Exact integer PageRank, chained one-CTE-per-iteration: every
    value is int64 with truncating division, so the sequential DuckDB
    evaluation and the distributed Spark join/agg loop must agree
    bit-for-bit."""
    cte = [_edges_cte().strip()]
    cte.append(
        "deg AS (SELECT src_id, COUNT(*) AS outdeg FROM edges GROUP BY src_id)"
    )
    cte.append(
        f"it0 AS (SELECT doc_id, CAST({PR_SCALE} AS BIGINT) AS s"
        " FROM documents)"
    )
    for t in range(1, iters + 1):
        cte.append(f"""
it{t} AS (
  SELECT d.doc_id,
    CAST({PR_BASE} + COALESCE(SUM(
      ({DAMP_NUM} * p.s) // ({DAMP_DEN} * g.outdeg)), 0) AS BIGINT) AS s
  FROM documents d
  LEFT JOIN edges e ON e.dst_id = d.doc_id
  LEFT JOIN deg g ON g.src_id = e.src_id
  LEFT JOIN it{t - 1} p ON p.doc_id = e.src_id
  GROUP BY d.doc_id
)""")
    return f"""
WITH {",".join(cte)}
SELECT d.source,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(f.s) AS BIGINT) AS score_sum,
  CAST(MIN(f.s) AS BIGINT) AS score_min,
  CAST(MAX(f.s) AS BIGINT) AS score_max
FROM documents d JOIN it{iters} f ON f.doc_id = d.doc_id
GROUP BY d.source
"""
