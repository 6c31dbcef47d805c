"""DuckDB oracle SQL for the Common-Crawl-style page table
(`BASELINE.json` input_hint shape — see sources/pages.py).

The page table is DERIVED deterministically from `documents`, so the
oracle re-derives the same rows in pure SQL: url/warc_ts/html-bytes
are exact integer/string arithmetic on both engines. The extraction
invariant row claims n_byte_exact == n_pages; the Spark side EARNS
that number by running the real byte-level extractor and comparing
bytes, so any extractor or builder defect shows up as a hash
mismatch, not a silently-agreeing tautology.

Parity notes: DuckDB `strlen` is BYTE length of a VARCHAR (matching
Spark `octet_length` on the encoded binary — the fixture text is
UTF-8 either way); string concatenation of BIGINT casts renders
identical digits on both engines.
"""

from __future__ import annotations

from ..sources.pages import _MID1, _MID2, _POST, _PRE, WARC_EPOCH


def pages_cte() -> str:
    """CTE `pages` re-deriving (doc_id, source, lang, epoch,
    html_bytes) — the oracle-comparable projection of the page
    table."""
    esc = (
        "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'),"
        " '>', '&gt;')"
    )
    html = (
        f"'{_PRE}' || source || ' #' || CAST(doc_id AS VARCHAR) || "
        f"'{_MID1}' || source || '{_MID2}' || {esc} || '{_POST}'"
    )
    return f"""
pages AS (
  SELECT doc_id, source, lang,
    {WARC_EPOCH} + doc_id AS epoch,
    CAST(strlen({html}) AS BIGINT) AS html_bytes
  FROM documents
)"""


def pages_extract_sql() -> str:
    """Per-source extraction audit: the invariant says every page's
    extracted main text is byte-identical to its text column, so
    n_byte_exact == n_pages; html_bytes and the warc_ts epoch range
    pin the builder arithmetic."""
    return f"""
WITH {pages_cte()}
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS n_pages,
  CAST(COUNT(*) AS BIGINT) AS n_byte_exact,
  CAST(SUM(html_bytes) AS BIGINT) AS html_bytes,
  CAST(MIN(epoch) AS BIGINT) AS min_epoch,
  CAST(MAX(epoch) AS BIGINT) AS max_epoch
FROM pages
GROUP BY source
"""


def pages_pip_sql(pip_crossings_expr, geocode_cte, region_edges_values) -> str:
    """Flagship semi-join over the input_hint shape: doc ids are
    parsed BACK from the url string (proving the url template
    roundtrips), then geocoded and point-in-polygon tested with the
    same expression tree as pip_region."""
    cross = pip_crossings_expr("g.lon", "g.lat")
    return f"""
WITH urls AS (
  SELECT 'https://' || source || '.example/p/' || CAST(doc_id AS VARCHAR)
           AS url,
         lang
  FROM documents
),
ids AS (
  SELECT CAST(string_split(url, '/')[-1] AS BIGINT) AS doc_id, lang
  FROM urls
),
{geocode_cte(source="ids")},
edges(x1, y1, x2, y2) AS (VALUES {region_edges_values()}),
hits AS (
  SELECT g.doc_id
  FROM geo g CROSS JOIN edges
  GROUP BY g.doc_id
  HAVING SUM({cross}) % 2 = 1
)
SELECT i.lang, COUNT(*) AS n_docs
FROM ids i JOIN hits USING (doc_id)
GROUP BY i.lang
"""
