"""DuckDB oracle for functions.bpe — an INDEPENDENT implementation of
the committed BPE application spec as a recursive CTE.

The Spark kernel applies merges imperatively in Python; this mirror
applies the SAME committed table (functions/bpe.BPE_MERGES/BPE_VOCAB,
single-sourced here so the two sides can never drift) declaratively:
each recursion step rewrites one word's symbol list by merging the
leftmost occurrence of the lowest-rank adjacent pair, terminating
when no pair is in the table. Token ids come from list_position into
the vocab literal. All compared values are int64 arithmetic — the
position-weighted checksum is a sum of integer products, exact at any
evaluation order.
"""

from __future__ import annotations

from ..functions.bpe import BPE_MERGES, BPE_VOCAB

_BIG = 999_999


def _rank_map() -> str:
    """MAP literal {'l|r': rank} (ranks 0-based like the engine)."""
    entries = ", ".join(
        f"'{l}|{r}': {i}" for i, (l, r) in enumerate(BPE_MERGES)
    )
    return "MAP {" + entries + "}"


def _vocab_list() -> str:
    return "[" + ", ".join(f"'{s}'" for s in BPE_VOCAB) + "]"


def _ranks_expr() -> str:
    """Per-adjacent-pair merge ranks of a symbol list ``syms``."""
    return (
        f"list_transform(range(1, GREATEST(len(syms), 1)), i -> "
        f"COALESCE(({_rank_map()})[syms[i] || '|' || syms[i+1]][1], {_BIG}))"
    )


def _bpe_cte() -> str:
    """The recursive merge-application CTE chain, ending in per-doc
    (doc_id, n_words, n_tokens, ids_checksum) as ``per_doc`` —
    shared by bpe_tokens_sql and bpe_pack_sql."""
    ranks = _ranks_expr()
    ids = (
        f"list_transform(syms, s -> "
        f"COALESCE(list_position({_vocab_list()}, s), 0) - 1)"
    )
    return f"""
words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
poswords AS (
  SELECT doc_id, i, w[i] AS word
  FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
),
uw AS (SELECT DISTINCT word FROM poswords),
bpe(word, syms) AS (
  SELECT word, list_transform(range(1, length(word) + 1), i -> word[i:i])
  FROM uw
  UNION ALL
  SELECT word, syms[1:bi - 1] || [syms[bi] || syms[bi + 1]] || syms[bi + 2:]
  FROM (
    SELECT word, syms, list_min(ranks) AS br,
           list_position(ranks, list_min(ranks)) AS bi
    FROM (SELECT word, syms, {ranks} AS ranks FROM bpe)
  ) WHERE br < {_BIG}
),
terminal AS (
  SELECT word, {ids} AS ids FROM (
    SELECT word, syms, list_min({ranks}) AS br FROM bpe
  ) WHERE br IS NULL OR br = {_BIG}
),
perword AS (
  SELECT pw.doc_id, pw.i, t.ids, len(t.ids) AS nt
  FROM poswords pw JOIN terminal t ON t.word = pw.word
),
offs AS (
  SELECT doc_id, i, ids, nt,
    CAST(COALESCE(SUM(nt) OVER (
      PARTITION BY doc_id ORDER BY i
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS off
  FROM perword
),
per_doc AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_words,
    CAST(SUM(nt) AS BIGINT) AS n_tokens,
    CAST(SUM(COALESCE(list_aggregate(
      list_transform(range(1, len(ids) + 1),
                     k -> (off + k) * ids[k]), 'sum'), 0)) AS BIGINT)
      AS ids_checksum
  FROM offs GROUP BY doc_id
)"""


def bpe_tokens_sql() -> str:
    return f"""
WITH RECURSIVE
{_bpe_cte()}
SELECT d.doc_id,
  COALESCE(p.n_words, 0) AS n_words,
  COALESCE(p.n_tokens, 0) AS n_tokens,
  COALESCE(p.ids_checksum, 0) AS ids_checksum
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


def bpe_pack_sql(context_len: int = 512, shard_docs: int = 256) -> str:
    """operators.packing.pack_counts over BPE token counts: the
    qualitysql.pack_sequences_sql window arithmetic with the
    whitespace proxy swapped for the recursive-CTE BPE counts."""
    c = int(context_len)
    return f"""
WITH RECURSIVE
{_bpe_cte()},
toks AS (
  SELECT d.doc_id, d.lang,
    d.doc_id // {int(shard_docs)} AS shard,
    COALESCE(p.n_tokens, 0) AS n_tokens
  FROM documents d LEFT JOIN per_doc p USING (doc_id)
),
packed AS (
  SELECT doc_id, lang, shard, n_tokens,
    COALESCE(SUM(n_tokens) OVER (
      PARTITION BY lang, shard ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ), 0) AS start_off
  FROM toks
),
bins AS (
  SELECT doc_id, lang, shard, n_tokens,
    start_off // {c} AS bin_first,
    (start_off + GREATEST(n_tokens, 1) - 1) // {c} AS bin_last
  FROM packed
)
SELECT lang,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(COUNT(DISTINCT shard) AS BIGINT) AS n_shards,
  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN bin_first <> bin_last THEN 1 ELSE 0 END) AS BIGINT)
    AS n_crossing,
  CAST(SUM((doc_id * 31 + bin_first * 7 + bin_last) % 999983) AS BIGINT)
    AS checksum
FROM bins GROUP BY lang
"""
