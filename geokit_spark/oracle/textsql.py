"""DuckDB oracle SQL for the text / dedup / similarity operators.

Mirrors geokit_spark.functions.text and operators.dedup expression
trees. DuckDB list comprehensions / lambdas correspond 1:1 to Spark's
transform/filter/aggregate; all hash arithmetic is BIGINT."""

from __future__ import annotations

from ..functions.text import LANG_MARKERS, STOPWORDS
from ..operators.dedup import (
    LEN_BAND,
    MH_A,
    MH_B,
    MH_PRIME,
    NUM_BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    SIM_BITS,
)

TOKENS = "string_split_regex(trim({t}), ' +')"


def tokens(t: str = "text") -> str:
    return TOKENS.format(t=t)


def shingles_cte(source: str = "documents", name: str = "sh") -> str:
    """CTE: (doc_id, s) distinct 3-char shingle codes per doc."""
    return f"""
{name} AS (
  SELECT doc_id, lang, n_chars,
    list_distinct([ascii(substr(text, i, 1)) * 65536
                   + ascii(substr(text, i + 1, 1)) * 256
                   + ascii(substr(text, i + 2, 1))
                   for i in range(1, greatest(length(text) - 2, 1) + 1)]) AS s
  FROM {source}
)"""


def stop_count(t: str = "text") -> str:
    lst = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"len(list_filter({tokens(t)}, x -> x IN ({lst})))"


def token_count(t: str = "text") -> str:
    return f"len({tokens(t)})"


def quality_expr(t: str = "text") -> str:
    n = f"CAST({token_count(t)} AS DOUBLE)"
    stop = f"CAST({stop_count(t)} AS DOUBLE)"
    tok_chars = f"(CAST(length(trim({t})) AS DOUBLE) - ({n} - CAST(1.0 AS DOUBLE)))"
    return f"{tok_chars} / {n} - CAST(2.0 AS DOUBLE) * ({stop} / {n})"


def lang_guess_expr(t: str = "text") -> str:
    """Iterative strictly-greater argmax, same order as the engine."""
    expr_lang = "'und'"
    expr_score = "-1"
    for lang, markers in LANG_MARKERS.items():
        lst = ",".join(f"'{m}'" for m in markers)
        score = f"len(list_filter({tokens(t)}, x -> x IN ({lst})))"
        expr_lang = f"CASE WHEN {score} > {expr_score} THEN '{lang}' ELSE {expr_lang} END"
        expr_score = f"CASE WHEN {score} > ({expr_score}) THEN {score} ELSE ({expr_score}) END"
    return expr_lang


def fingerprint_expr(t: str = "text") -> str:
    return f"md5(list_aggregate({tokens(t)}, 'string_agg', ' '))"


def candidate_pairs_sql(sh: str = "sh") -> str:
    return f"""
cand AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.s AS sh_a, b.s AS sh_b
  FROM {sh} a JOIN {sh} b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
   AND abs(a.n_chars - b.n_chars) <= {LEN_BAND}
)"""


def jaccard_expr(a: str = "sh_a", b: str = "sh_b") -> str:
    inter = f"CAST(len(list_intersect({a}, {b})) AS DOUBLE)"
    union = f"CAST(len(list_distinct(list_concat({a}, {b}))) AS DOUBLE)"
    return f"{inter} / {union}"


def minhash_cols() -> list[str]:
    return [
        f"list_min(list_transform(s, c -> ({MH_A[i]} * CAST(c AS BIGINT) + {MH_B[i]}) % {MH_PRIME})) AS mh_{i}"
        for i in range(NUM_HASHES)
    ]


def band_keys_union(sig: str = "sig") -> str:
    """UNION ALL of band rows: (doc_id, band, band_key)."""
    parts = []
    for b in range(NUM_BANDS):
        cols = [f"mh_{b * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)]
        key = " || '_' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        parts.append(
            f"SELECT doc_id, {b} AS band, {key} AS band_key FROM {sig}"
        )
    return " UNION ALL ".join(parts)


def simhash_expr(s: str = "s") -> str:
    """64-bit sketch mirror of dedup.simhash_col: bit b uses hash
    function j = b // 16 at bit position b % 16; bit 63 is the BIGINT
    sign bit (term -2^63, written as -9223372036854775807 - 1 so the
    literal stays BIGINT). Terms sum left-assoc with the negative term
    last, so no partial sum overflows."""
    from ..operators.dedup import SIM_BITS_PER_HASH

    terms = []
    for b in range(SIM_BITS):
        j, p = b // SIM_BITS_PER_HASH, b % SIM_BITS_PER_HASH
        acc = (
            f"list_sum(list_transform({s}, "
            f"c -> 2 * (((({MH_A[j]} * CAST(c AS BIGINT) + {MH_B[j]}) % {MH_PRIME}) // {1 << p}) % 2) - 1))"
        )
        val = "(-9223372036854775807 - 1)" if b == 63 else str(1 << b)
        terms.append(
            f"(CASE WHEN {acc} > 0 THEN CAST({val} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def dot_expr(a: str, b: str) -> str:
    """Left-fold float64 dot product (mirrors similarity.dot_col)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), (acc, v) -> acc + v)"
    )


def norm_expr(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (acc, v) -> acc + v))"
    )


def token_class_exprs_sql(t: str = "text") -> dict:
    """DuckDB mirror of functions.text.token_class_exprs: same
    per-position ascii arithmetic, same i = 1 predecessor guard
    (DuckDB substr(t, 0, 1) = '' but the guard keeps both engines on
    the same branch), integer sums cast to BIGINT."""

    def a(pos: str) -> str:
        return f"ascii(substr({t}, {pos}, 1))"

    def is_alpha(pos: str) -> str:
        return (
            f"(({a(pos)} >= 65 AND {a(pos)} <= 90)"
            f" OR ({a(pos)} >= 97 AND {a(pos)} <= 122))"
        )

    def is_digit(pos: str) -> str:
        return f"({a(pos)} >= 48 AND {a(pos)} <= 57)"

    def run_starts(pred) -> str:
        prev = f"CASE WHEN i = 1 THEN FALSE ELSE {pred('i - 1')} END"
        return (
            f"CAST(list_sum([CASE WHEN {pred('i')} AND NOT ({prev})"
            f" THEN 1 ELSE 0 END"
            f" for i in range(1, greatest(length({t}), 1) + 1)]) AS BIGINT)"
        )

    punct = (
        f"CAST(list_sum([CASE WHEN {a('i')} > 32 AND NOT {is_alpha('i')}"
        f" AND NOT {is_digit('i')} THEN 1 ELSE 0 END"
        f" for i in range(1, greatest(length({t}), 1) + 1)]) AS BIGINT)"
    )
    return {
        "n_alpha_tokens": run_starts(lambda p: is_alpha(p)),
        "n_num_tokens": run_starts(lambda p: is_digit(p)),
        "n_punct_tokens": punct,
    }
