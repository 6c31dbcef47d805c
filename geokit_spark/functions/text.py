"""Text-analysis functions for the web-page payload — all built-in
pyspark.sql.functions (JVM, codegen); no Python in the hot path.

These are the large-scale training-data-pipeline ops grafted onto the
engine (task mandate): token counting, quality scoring, language-ID
heuristic, document fingerprinting. Each has a DuckDB-oracle twin in
oracle/textsql.py built from the same expression trees (lambda list
functions exist in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("a", "the")

# deterministic language marker tokens (heuristic n-gram/keyword ID —
# the mechanics of a lang-ID stage; real models would be broadcast here)
LANG_MARKERS = {
    "en": ("the", "query", "fast"),
    "de": ("der", "und", "nicht"),
    "fr": ("le", "et", "pas"),
    "es": ("el", "y", "no"),
    "zh": ("zh", "ni", "hao"),
}


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (split on runs of spaces)."""
    return F.split(F.trim(text), " +")


def token_count(text: Column) -> Column:
    return F.size(tokens_col(text))


def stopword_count(text: Column) -> Column:
    toks = tokens_col(text)
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in exact arithmetic:
    score = avg_token_len - 2 * stopword_ratio
    (length/punct/stopword-ratio family; reference has no text ops —
    this is the training-pipeline graft)."""
    n = token_count(text).cast("double")
    stop = stopword_count(text).cast("double")
    # total token chars = chars - single separating spaces
    tok_chars = (F.length(F.trim(text)).cast("double") - (n - F.lit(1.0)))
    return tok_chars / n - F.lit(2.0) * (stop / n)


def lang_guess(text: Column) -> Column:
    """Marker-token language ID with deterministic tie-break (first
    lang in LANG_MARKERS order wins ties via strictly-greater compare)."""
    toks = tokens_col(text)
    best_lang = F.lit("und")
    best_score = F.lit(-1)

    def marker_filter(markers):
        return lambda t: t.isin(*markers)

    for lang, markers in LANG_MARKERS.items():
        score = F.size(F.filter(toks, marker_filter(markers)))
        better = score > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, score).otherwise(best_score)
    return best_lang


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 hex of the token-normalized text
    (same algorithm in both engines)."""
    return F.md5(F.array_join(tokens_col(text), " "))


def token_class_exprs(text_col: str = "text") -> dict:
    """BPE-ish pre-tokenizer counts (GPT-2-style splitting
    approximated by character-class runs): maximal ASCII-letter runs,
    maximal digit runs, and individual punctuation characters each
    count as one token — the subword-budget estimator of a training
    pipeline. Pure per-position arithmetic over ascii codes (no engine
    regex: Java util.regex and DuckDB RE2 differ at the edges, ascii
    comparisons do not). i = 1 guards the predecessor lookup — Spark
    treats substring(t, 0, 1) as position 1 while DuckDB returns ''.
    Returns {name: Column}."""
    t = text_col

    def a(pos: str) -> str:
        return f"ascii(substring({t}, {pos}, 1))"

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
            f"aggregate(transform(sequence(1, greatest(length({t}), 1)),"
            f" i -> CASE WHEN {pred('i')} AND NOT ({prev})"
            f" THEN 1 ELSE 0 END), 0L, (acc, x) -> acc + x)"
        )

    punct = (
        f"aggregate(transform(sequence(1, greatest(length({t}), 1)),"
        f" i -> CASE WHEN {a('i')} > 32 AND NOT {is_alpha('i')}"
        f" AND NOT {is_digit('i')} THEN 1 ELSE 0 END),"
        f" 0L, (acc, x) -> acc + x)"
    )
    return {
        "n_alpha_tokens": F.expr(run_starts(lambda p: is_alpha(p))),
        "n_num_tokens": F.expr(run_starts(lambda p: is_digit(p))),
        "n_punct_tokens": F.expr(punct),
    }


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return (
        df.withColumn("n_tokens", token_count(t))
        .withColumn("n_stop", stopword_count(t))
        .withColumn("quality", quality_score(t))
        .withColumn("lang_guess", lang_guess(t))
        .withColumn("fp", fingerprint(t))
    )
