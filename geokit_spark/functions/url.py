"""URL canonicalization for Common-Crawl-style page tables.

Pure whole-stage-codegen column expressions (substring_index / split /
array_sort / concat) — no UDF, no shuffle: at 100-TB scale these fuse
into the parquet scan stage.

Three levels, mirroring crawl-archive practice:

- ``canonical_url``: display normalization — lowercase scheme+host,
  default port (:80/:443) dropped, fragment dropped, query params
  byte-sorted. Distinct schemes/hosts stay distinct.
- ``surt_key``: SURT-style revisit key (the convention crawl indexes
  sort by): scheme dropped, leading ``www.`` dropped, host labels
  reversed and comma-joined, then ``)`` + path + sorted query — so
  ``HTTPS://SRC.Example:443/p/7#x`` and ``http://www.src.example/p/7``
  collapse to ``example,src)/p/7``.
- ``registrable_domain``: host rolled up to its registrable suffix
  (two labels, or three under multi-label public suffixes like
  ``co.uk`` — a small built-in suffix table; the full PSL is a config
  concern, not an engine one).

Reference parity anchor: the reference engine has no URL layer (its
inputs are OGR layers); this module is the webtext-side analogue of
its SRS normalization (`/root/reference/geokit/core/srs.py:22-76`) —
normalize once at ingest, join on the normalized key everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# multi-label public suffixes recognized for registrable-domain
# rollup: second-level label under a 2-letter ccTLD
_CC_TLDS = ("uk", "au", "jp", "nz", "za", "br", "in", "kr")
_SECOND_LABELS = ("co", "ac", "gov", "org", "net", "com", "edu")


def _parts(url: Column):
    """Split a url column into (scheme, host, portkeep, path, sortq)
    — all guards explicit so absent separators degrade cleanly."""
    u = F.substring_index(url, "#", 1)  # fragment dropped
    has_scheme = F.instr(u, "://") > 0
    scheme = F.when(has_scheme, F.lower(F.substring_index(u, "://", 1))).otherwise(
        F.lit("")
    )
    rest = F.when(has_scheme, F.substring_index(u, "://", -1)).otherwise(u)
    hostport = F.substring_index(rest, "/", 1)
    path_q = F.substr(rest, F.length(hostport) + 1)
    has_port = F.instr(hostport, ":") > 0
    host = F.lower(F.substring_index(hostport, ":", 1))
    port = F.when(has_port, F.substring_index(hostport, ":", -1)).otherwise(
        F.lit("")
    )
    default = ((scheme == "https") & (port == "443")) | (
        (scheme == "http") & (port == "80")
    )
    portkeep = F.when(
        (port == "") | default, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    has_q = F.instr(path_q, "?") > 0
    path = F.when(has_q, F.substring_index(path_q, "?", 1)).otherwise(path_q)
    query = F.when(has_q, F.substring_index(path_q, "?", -1)).otherwise(F.lit(""))
    sortq = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return scheme, host, portkeep, path, sortq


def _qpart(sortq: Column) -> Column:
    return F.when(sortq == "", F.lit("")).otherwise(F.concat(F.lit("?"), sortq))


def canonical_url(url: Column) -> Column:
    scheme, host, portkeep, path, sortq = _parts(url)
    return F.concat(scheme, F.lit("://"), host, portkeep, path, _qpart(sortq))


def _strip_www(host: Column) -> Column:
    return F.when(host.startswith("www."), F.substr(host, F.lit(5))).otherwise(
        host
    )


def surt_key(url: Column) -> Column:
    # SURT keeps NON-default ports (host:8080 vs host:9090 are distinct
    # origins): portkeep is '' for absent/default ports, ':NNNN' else,
    # appended after the reversed labels — 'com,example:8080)/path'.
    _, host, portkeep, path, sortq = _parts(url)
    h = _strip_www(host)
    return F.concat(
        F.array_join(F.reverse(F.split(h, "\\.")), ","),
        portkeep,
        F.lit(")"),
        path,
        _qpart(sortq),
    )


def url_host(url: Column) -> Column:
    _, host, _, _, _ = _parts(url)
    return _strip_www(host)


def url_path_id(url: Column) -> Column:
    """Last path segment as a long (the deterministic inverse of the
    page-table url templates) — query/fragment-safe, unlike a naive
    split on '/'."""
    _, _, _, path, _ = _parts(url)
    return F.substring_index(path, "/", -1).cast("long")


def registrable_domain(url: Column) -> Column:
    # url_host already strips one leading 'www.'; stripping again here
    # would mis-fold degenerate hosts (www.www.x.com would lose two
    # labels, and host 'www.com' would collapse to bare 'com').
    labs = F.split(url_host(url), "\\.")
    n = F.size(labs)
    tld = F.try_element_at(labs, n)
    sld = F.try_element_at(labs, n - 1)
    take3 = (
        (n >= 3)
        & tld.isin(*_CC_TLDS)
        & sld.isin(*_SECOND_LABELS)
    )
    # greatest() keeps the slice start >= 1 in the branch not taken
    return F.when(
        take3, F.concat_ws(".", F.slice(labs, F.greatest(n - 2, F.lit(1)), 3))
    ).otherwise(
        F.concat_ws(".", F.slice(labs, F.greatest(n - 1, F.lit(1)), 2))
    )
