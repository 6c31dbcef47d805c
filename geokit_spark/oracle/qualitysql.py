"""DuckDB oracle SQL for operators.quality (Gopher repetition,
C4-style quality filter, corpus vocabulary, span dedup).

Parity conventions (oracle/sqlgen.py docstring): all compared values
are exact-integer arithmetic plus at most ONE double division of
integers, so value hashes match bit-exactly. Gram arrays use
``string_split(text, ' ')`` (the dedup convention); token-level stats
use ``string_split_regex(trim(text), ' +')`` (the functions.text
convention) — each mirrors its engine counterpart.
"""

from __future__ import annotations

from ..functions.text import STOPWORDS
from ..operators.quality import (
    MAX_MEAN_WORD_LEN,
    MAX_WORDS,
    MIN_MEAN_WORD_LEN,
    MIN_WORDS,
    SPAN_DF,
    SPAN_N,
    SUBSTR_N,
)
from .sqlgen import d
from .textsql import tokens


def _gram_union(ns: tuple[int, ...]) -> str:
    parts = []
    for n in ns:
        parts.append(
            f"SELECT doc_id, {n} AS n, array_to_string(w[i:i + {n - 1}], ' ') AS gram\n"
            f"  FROM words, UNNEST(range(1, GREATEST(len(w) - {n - 1}, 0) + 1)) AS t(i)"
        )
    return "\n  UNION ALL\n  ".join(parts)


def gopher_repetition_sql(ns: tuple[int, ...] = (2, 3)) -> str:
    sel = ["d.doc_id"]
    joins = []
    for n in ns:
        a = f"s{n}"
        joins.append(
            f"LEFT JOIN stats {a} ON {a}.doc_id = d.doc_id AND {a}.n = {n}"
        )
        sel += [
            f"COALESCE({a}.top_gram, '') AS top{n}_gram",
            f"CAST(COALESCE({a}.top_cnt, 0) AS BIGINT) AS top{n}_cnt",
            f"CAST(COALESCE({a}.top_chars, 0) AS DOUBLE)"
            f" / CAST(length(d.text) AS DOUBLE) AS top{n}_frac",
            f"CAST(COALESCE({a}.dup_chars, 0) AS DOUBLE)"
            f" / CAST(length(d.text) AS DOUBLE) AS dup{n}_frac",
        ]
    return f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
grams AS (
  {_gram_union(ns)}
),
cnts AS (
  SELECT doc_id, n, gram, COUNT(*) AS cnt FROM grams GROUP BY 1, 2, 3
),
per AS (
  SELECT doc_id, n,
    CAST(SUM(CASE WHEN cnt >= 2 THEN cnt * length(gram) ELSE 0 END)
      AS BIGINT) AS dup_chars
  FROM cnts GROUP BY 1, 2
),
top AS (
  SELECT doc_id, n, gram AS top_gram, CAST(cnt AS BIGINT) AS top_cnt,
    CAST(cnt * length(gram) AS BIGINT) AS top_chars
  FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id, n ORDER BY cnt DESC, gram ASC) AS rn
    FROM cnts
  ) WHERE rn = 1
),
stats AS (
  SELECT p.doc_id, p.n, p.dup_chars, t.top_gram, t.top_cnt, t.top_chars
  FROM per p JOIN top t ON p.doc_id = t.doc_id AND p.n = t.n
)
SELECT {", ".join(sel)}
FROM documents d
{chr(10).join(joins)}
"""


def quality_filter_sql(relation: str = "documents") -> str:
    toks = tokens()
    lst = ",".join(f"'{w}'" for w in STOPWORDS)
    nw = f"len({toks})"
    mean = (
        f"CAST(length(trim(text)) - ({nw} - 1) AS DOUBLE)"
        f" / CAST({nw} AS DOUBLE)"
    )
    nstop = f"len(list_filter({toks}, x -> x IN ({lst})))"
    reason = f"""CASE
    WHEN text IS NULL THEN 'null_text'
    WHEN {nw} < {MIN_WORDS} THEN 'too_short'
    WHEN {nw} > {MAX_WORDS} THEN 'too_long'
    WHEN {mean} < {d(MIN_MEAN_WORD_LEN)} THEN 'word_len_low'
    WHEN {mean} > {d(MAX_MEAN_WORD_LEN)} THEN 'word_len_high'
    WHEN {nstop} = 0 THEN 'no_stopword'
    ELSE 'ok' END"""
    return f"""
SELECT doc_id,
  CAST({nw} AS BIGINT) AS n_words,
  {mean} AS mean_word_len,
  CAST({nstop} AS BIGINT) AS n_stopwords,
  {reason} AS reason,
  ({reason}) = 'ok' AS keep
FROM {relation}
"""


def vocab_topk_sql(k: int = 50) -> str:
    return f"""
SELECT word, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT UNNEST({tokens()}) AS word FROM documents)
GROUP BY word
ORDER BY n DESC, word ASC
LIMIT {k}
"""


def span_dedup_sql(n: int = SPAN_N, min_df: int = SPAN_DF) -> str:
    return f"""
WITH words AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, i, md5(array_to_string(w[i:i + {n - 1}], ' ')) AS g
  FROM words, UNNEST(range(1, GREATEST(len(w) - {n - 1}, 0) + 1)) AS t(i)
),
hot AS (
  SELECT g FROM (
    SELECT g, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY g
  ) WHERE df >= {min_df}
),
cover AS (
  SELECT DISTINCT gr.doc_id, gr.i + o.o AS p
  FROM grams gr JOIN hot USING (g), UNNEST(range(0, {n})) AS o(o)
),
poswords AS (
  SELECT doc_id, i AS p, w[i] AS word
  FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
),
kept AS (
  SELECT pw.doc_id, pw.p, pw.word
  FROM poswords pw LEFT JOIN cover c
    ON c.doc_id = pw.doc_id AND c.p = pw.p
  WHERE c.p IS NULL
),
cleaned AS (
  SELECT doc_id, COUNT(*) AS kept_n,
    string_agg(word, ' ' ORDER BY p) AS s
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
  CAST(len(string_split(d.text, ' ')) - COALESCE(c.kept_n, 0) AS BIGINT)
    AS n_dropped,
  md5(COALESCE(c.s, '')) AS clean_md5
FROM documents d LEFT JOIN cleaned c USING (doc_id)
"""


def substring_dedup_sql(n: int = SUBSTR_N) -> str:
    """operators.quality.substring_dedup mirror: duplicated = gram in
    >1 distinct doc (MIN(doc_id) <> MAX(doc_id) — same criterion, but
    the oracle derives the cover/spans/rebuild through independent
    relational joins instead of per-doc array lambdas."""
    return f"""
WITH words AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
grams AS (
  SELECT doc_id, i, md5(array_to_string(w[i:i + {n - 1}], ' ')) AS g
  FROM words, UNNEST(range(1, GREATEST(len(w) - {n - 1}, 0) + 1)) AS t(i)
),
dup AS (
  SELECT g FROM grams GROUP BY g HAVING MIN(doc_id) <> MAX(doc_id)
),
cover AS (
  SELECT DISTINCT gr.doc_id, gr.i + o.o AS p
  FROM grams gr JOIN dup USING (g), UNNEST(range(0, {n})) AS o(o)
),
spans AS (
  SELECT c.doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_dup,
    CAST(SUM(CASE WHEN c2.p IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      AS n_spans
  FROM cover c LEFT JOIN cover c2
    ON c2.doc_id = c.doc_id AND c2.p = c.p - 1
  GROUP BY c.doc_id
),
poswords AS (
  SELECT doc_id, i AS p, w[i] AS word
  FROM words, UNNEST(range(1, len(w) + 1)) AS t(i)
),
kept AS (
  SELECT pw.doc_id, pw.p, pw.word
  FROM poswords pw LEFT JOIN cover c
    ON c.doc_id = pw.doc_id AND c.p = pw.p
  WHERE c.p IS NULL
),
cleaned AS (
  SELECT doc_id, string_agg(word, ' ' ORDER BY p) AS s
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
  CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
  COALESCE(s.n_dup, 0) AS n_dup,
  COALESCE(s.n_spans, 0) AS n_spans,
  md5(CASE WHEN s.doc_id IS NULL THEN d.text
           ELSE COALESCE(c.s, '') END) AS clean_md5
FROM documents d
LEFT JOIN spans s USING (doc_id)
LEFT JOIN cleaned c ON c.doc_id = d.doc_id
"""


def classifier_scores_sql() -> str:
    """operators.quality.classifier_scores mirror: the oracle builds
    the feature stream relationally (unigram/bigram UNNEST) instead
    of array lambdas; the weight formula is interpolated VERBATIM
    from the engine (quality._weight_sql), only the hex->int64 cast
    differs by dialect (the verified '0x'-cast route)."""
    from ..operators.quality import _weight_sql

    h48 = "CAST(('0x' || substring(md5(f), 1, 12)) AS BIGINT)"
    w = _weight_sql(h48)
    return f"""
WITH words AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
feats AS (
  SELECT doc_id, UNNEST(t) AS f FROM words
  UNION ALL
  SELECT doc_id, array_to_string(t[i:i + 1], ' ') AS f
  FROM words, UNNEST(range(1, GREATEST(len(t) - 1, 0) + 1)) AS o(i)
),
scored AS (
  SELECT doc_id,
    CAST(COUNT(*) AS BIGINT) AS n_features,
    CAST(SUM({w}) AS BIGINT) AS score
  FROM feats GROUP BY doc_id
)
SELECT d.doc_id,
  COALESCE(s.n_features, 0) AS n_features,
  COALESCE(s.score, 0) AS score,
  (d.text IS NOT NULL AND COALESCE(s.score, 0) >= 0) AS keep
FROM documents d LEFT JOIN scored s USING (doc_id)
"""


PII_INJECT_DUCK = (
    "text"
    " || CASE WHEN doc_id % 5 = 1 THEN"
    " ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.org today'"
    " ELSE '' END"
    " || CASE WHEN doc_id % 5 = 3 OR doc_id % 7 = 2 THEN"
    " ' call ' || CAST(5550000 + doc_id AS VARCHAR)"
    " ELSE '' END"
)


def pii_scrub_sql() -> str:
    """operators.quality.pii_scrub mirror over the deterministically
    PII-injected corpus. The token predicates are imported VERBATIM
    from the engine (instr/substr/reverse/translate are
    dialect-identical); only the array wrappers differ
    (len/list_filter/list_transform/array_to_string vs
    size/filter/transform/concat_ws)."""
    from ..operators.quality import _email_cond, _phone_cond

    em = _email_cond("t")
    ph = _phone_cond("t")
    red = (
        f"array_to_string(list_transform(w, t -> CASE"
        f" WHEN {em} THEN '<EMAIL>'"
        f" WHEN {ph} THEN '<PHONE>'"
        f" ELSE t END), ' ')"
    )
    return f"""
WITH injected AS (
  SELECT doc_id, {PII_INJECT_DUCK} AS text FROM documents
),
toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM injected
)
SELECT doc_id,
  CAST(len(list_filter(w, t -> {em})) AS BIGINT) AS n_emails,
  CAST(len(list_filter(w, t -> NOT {em} AND {ph})) AS BIGINT)
    AS n_phones,
  len(list_filter(w, t -> {em} OR {ph})) > 0 AS has_pii,
  md5({red}) AS redacted_md5
FROM toks
"""


def decontaminate_sql(n: int = 13, eval_mod: int = 97) -> str:
    """operators.quality.decontaminate mirror: same word-split gram
    convention as gopher_repetition_sql, distinct grams per doc LEFT
    JOIN the distinct eval-gram set; the final LEFT JOIN back to
    documents restores docs too short to have any n-gram (Spark keeps
    them via explode_outer). Integer counts only."""
    gram = f"array_to_string(w[i:i + {n - 1}], ' ')"
    unn = (
        f"UNNEST(range(1, GREATEST(len(w) - {n - 1}, 0) + 1)) AS t(i)"
    )
    return f"""
WITH words AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
eval_grams AS (
  SELECT DISTINCT {gram} AS gram
  FROM words, {unn}
  WHERE doc_id % {int(eval_mod)} = 0
),
doc_grams AS (
  SELECT DISTINCT doc_id, {gram} AS gram
  FROM words, {unn}
),
hits AS (
  SELECT g.doc_id,
    COUNT(*) AS n_grams,
    COUNT(e.gram) AS hits
  FROM doc_grams g LEFT JOIN eval_grams e USING (gram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
  CAST(COALESCE(h.n_grams, 0) AS BIGINT) AS n_grams,
  CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
  COALESCE(h.hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def pack_sequences_sql(
    context_len: int = 512, shard_docs: int = 256
) -> str:
    """operators.packing mirror: the same shard arithmetic, window
    cumsum, and truncating bin division in DuckDB window SQL — both
    engines compute int64 trees, so the per-lang packing checksum
    must agree bit-for-bit."""
    from .textsql import token_count

    c = int(context_len)
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
    doc_id // {int(shard_docs)} AS shard,
    CAST({token_count()} AS BIGINT) AS n_tokens
  FROM documents
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
