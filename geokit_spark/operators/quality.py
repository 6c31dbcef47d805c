"""Corpus-quality operators for LLM training-data curation — the
Gopher/C4-style pipeline stages (repetition statistics, composite
quality filtering, corpus vocabulary, duplicated-span removal) over
the documents/pages text column. All candidate generation and
aggregation is built-in JVM expressions (split / transform / slice /
explode / hash-agg); nothing here runs Python per row.

100-TB shapes:
- gopher_repetition: one explode + hash-agg on (doc_id, n, gram) —
  partial-aggregated map-side, then one per-doc combine; the window
  that picks each doc's top gram partitions on the SAME (doc_id, n)
  key, so AQE reuses the exchange.
- quality_filter: fully narrow (per-row expressions only) — pipelines
  with the scan, no shuffle at any scale.
- vocab_topk: hash-agg on word (Zipf skew is absorbed by map-side
  partial aggregation — the hot word arrives at the reducer as one
  partial row per map task, not one row per occurrence) + TakeOrdered.
- span_dedup: reuses the boilerplate hot-set (dedup.ngram_doc_freq);
  the hot set joins via the size-aware broadcast hint and position
  cover sets stay per-doc arrays — never a corpus-wide shuffle of
  text bytes.

The reference has no text-curation surface (geospatial library); these
graft the webtext payload onto the engine per the task mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, tokens_col

# quality_filter thresholds (documented contract; tuned so the
# synthetic corpus exercises every branch)
MIN_WORDS = 15
MAX_WORDS = 10_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 8.0

SPAN_N = 5  # words per span-dedup n-gram (= dedup.BOILER_N)
SPAN_DF = 20  # corpus document-frequency threshold (= dedup.BOILER_DF)

SUBSTR_N = 8  # minimum duplicated-substring length (words) for
#              substring_dedup — the Lee-et-al-style memorization gate


def _grams_expr(n: int, words: str = "split(text, ' ')") -> str:
    """SQL-expression array of word n-grams (space-joined). The
    short-doc guard must be an IF, not greatest(..., 0): Spark's
    sequence(1, 0) is the DESCENDING [1, 0] (DuckDB's range(1, 1) is
    empty), so an unguarded upper bound crashes slice() on any doc
    shorter than n words."""
    return (
        f"if(size({words}) >= {n},"
        f" transform(sequence(1, size({words}) - {n - 1}),"
        f" i -> concat_ws(' ', slice({words}, i, {n}))), array())"
    )


def gopher_repetition(docs: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Per-doc within-document repetition statistics (the Gopher
    repetition-removal signals): for each n in `ns`,

    - top{n}_gram / top{n}_cnt: the most frequent word n-gram (ties
      broken lexicographically ascending) and its occurrence count;
    - top{n}_frac: characters covered by occurrences of that gram,
      ``top_cnt * length(gram) / length(text)``;
    - dup{n}_frac: characters covered by ALL duplicated n-grams,
      ``sum(cnt * length(gram) for grams with cnt >= 2) / length(text)``.

    Both fractions are a single double division of exact integers, so
    they hash-compare bit-exactly cross-engine. Docs shorter than n
    words report 0 counts, '' gram, 0.0 fractions."""
    structs = ", ".join(
        f"transform({_grams_expr(n)}, g -> struct({n} AS n, g AS gram))"
        for n in ns
    )
    grams = docs.select(
        "doc_id", F.explode(F.expr(f"concat({structs})")).alias("g")
    ).select("doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))

    cnts = grams.groupBy("doc_id", "n", "gram").agg(
        F.count("*").alias("cnt")
    )
    per = cnts.groupBy("doc_id", "n").agg(
        F.sum(
            F.when(
                F.col("cnt") >= 2, F.col("cnt") * F.length("gram")
            ).otherwise(F.lit(0))
        ).cast("long").alias("dup_chars"),
    )
    w = Window.partitionBy("doc_id", "n").orderBy(
        F.col("cnt").desc(), F.col("gram").asc()
    )
    top = (
        cnts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "n",
            F.col("gram").alias("top_gram"),
            F.col("cnt").alias("top_cnt"),
            (F.col("cnt") * F.length("gram")).cast("long").alias("top_chars"),
        )
    )
    stats = per.join(top, ["doc_id", "n"])
    base = docs.select("doc_id", F.length("text").cast("long").alias("nc"))
    out = base
    for n in ns:
        s_n = stats.filter(F.col("n") == n).select(
            "doc_id",
            F.col("top_gram").alias(f"top{n}_gram"),
            F.col("top_cnt").alias(f"top{n}_cnt"),
            F.col("top_chars").alias(f"_tc{n}"),
            F.col("dup_chars").alias(f"_dc{n}"),
        )
        out = out.join(s_n, "doc_id", "left")
    cols = [F.col("doc_id")]
    for n in ns:
        cols += [
            F.coalesce(F.col(f"top{n}_gram"), F.lit("")).alias(f"top{n}_gram"),
            F.coalesce(F.col(f"top{n}_cnt"), F.lit(0)).cast("long").alias(
                f"top{n}_cnt"
            ),
            (
                F.coalesce(F.col(f"_tc{n}"), F.lit(0)).cast("double")
                / F.col("nc").cast("double")
            ).alias(f"top{n}_frac"),
            (
                F.coalesce(F.col(f"_dc{n}"), F.lit(0)).cast("double")
                / F.col("nc").cast("double")
            ).alias(f"dup{n}_frac"),
        ]
    return out.select(*cols)


def quality_filter(
    docs: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """C4/Gopher-style composite per-document quality gate — pure
    per-row JVM expressions (no shuffle): word-count bounds, mean
    word length bounds, stopword presence. Emits the decision AND the
    first failing rule so downstream stages can stratify rejects.
    `passthrough` columns (e.g. the text itself) ride along so a
    pipeline can filter-and-continue without a self-join back to the
    input.

    mean_word_len = (chars - (n_words - 1)) / n_words — exact for the
    single-space tokenized corpus; expression tree mirrored in the
    oracle."""
    toks = tokens_col(F.col("text"))
    nw = F.size(toks)
    mean_len = (
        (F.length(F.trim("text")) - (nw - F.lit(1))).cast("double")
        / nw.cast("double")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    reason = (
        # NULL text must fail the gate explicitly: every numeric WHEN
        # below evaluates NULL on NULL input and would fall through to
        # otherwise('ok'), silently keeping an empty document.
        F.when(F.col("text").isNull(), F.lit("null_text"))
        .when(nw < F.lit(MIN_WORDS), F.lit("too_short"))
        .when(nw > F.lit(MAX_WORDS), F.lit("too_long"))
        .when(mean_len < F.lit(MIN_MEAN_WORD_LEN), F.lit("word_len_low"))
        .when(mean_len > F.lit(MAX_MEAN_WORD_LEN), F.lit("word_len_high"))
        .when(n_stop == F.lit(0), F.lit("no_stopword"))
        .otherwise(F.lit("ok"))
    )
    return docs.select(
        "doc_id",
        nw.cast("long").alias("n_words"),
        mean_len.alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
        reason.alias("reason"),
        (reason == F.lit("ok")).alias("keep"),
        *passthrough,
    )


def robots_noindex(html=None) -> Column:
    """True iff the page's meta-robots tag carries a ``noindex``
    directive: extract the content attribute of ``<meta
    name="robots" ...>`` from the (case-folded) html bytes, split the
    directive list on commas, trim each token, and test membership —
    NOT a substring match, so ``content="index, follow"`` stays
    indexable. Whole-stage-codegen expressions over the decoded
    bytes; no UDF, no shuffle."""
    if html is None:
        html = F.col("html")
    content = F.regexp_extract(
        F.lower(F.decode(html, "UTF-8")),
        '<meta name="robots" content="([^"]*)"',
        1,
    )
    return F.exists(
        F.split(content, ","), lambda t: F.trim(t) == F.lit("noindex")
    )


def filter_noindex(pages: DataFrame) -> DataFrame:
    """Crawl-hygiene gate: drop every page whose meta-robots directive
    list contains ``noindex`` (the opt-out signal every responsible
    corpus pipeline honors). One narrow codegen filter fused into the
    scan — at 100 TB this is a predicate on the html column, no
    exchange, no Python."""
    return pages.filter(~robots_noindex())


def _email_cond(tok: str = "t") -> str:
    """SQL boolean over a token: email-shaped (single '@', local part
    non-empty, '.' strictly inside the domain)."""
    return (
        f"(instr({tok}, '@') >= 2"
        f" AND instr(substr({tok}, instr({tok}, '@') + 1), '@') = 0"
        f" AND instr(substr({tok}, instr({tok}, '@') + 1), '.') >= 2"
        f" AND instr(reverse(substr({tok}, instr({tok}, '@') + 1)), '.')"
        f" >= 2)"
    )


def _phone_cond(tok: str = "t") -> str:
    """SQL boolean over a token: digit run of >= 7 chars."""
    return (
        f"(length({tok}) >= 7"
        f" AND translate({tok}, '0123456789', '') = '')"
    )


def redacted_text_expr(text_col: str = "text") -> str:
    """SQL expression: the text with PII tokens replaced by the
    <EMAIL>/<PHONE> sentinels (shared by pii_scrub's audit md5 and
    pipelines that carry the redacted text forward)."""
    toks = f"split({text_col}, ' ')"
    em = _email_cond("t")
    ph = _phone_cond("t")
    return (
        f"concat_ws(' ', transform({toks}, t -> CASE"
        f" WHEN {em} THEN '<EMAIL>'"
        f" WHEN {ph} THEN '<PHONE>'"
        f" ELSE t END))"
    )


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII detection + redaction (the C4/CCNet scrub stage): flag and
    replace email-shaped tokens with <EMAIL> and long digit runs
    (>= 7) with <PHONE>. Regex-free — position/translate arithmetic
    only, so the same rule states in Spark and the DuckDB oracle.

    Output per doc: n_emails, n_phones, has_pii, and md5 of the
    redacted text (space-rejoined tokens) as the redaction audit.

    Known trade-off: detection is TOKEN-granular — PII glued to
    trailing punctuation ('bob@x.org,') is not matched; a stripping
    pre-pass would need the same rule stated on both engines and is
    out of scope for the parity-checked surface.

    100-TB shape: fully narrow — per-row JVM expressions pipelined
    with the scan, no shuffle, no UDF."""
    toks = f"split({text_col}, ' ')"
    em = _email_cond("t")
    ph = _phone_cond("t")
    n_emails = F.expr(
        f"size(filter({toks}, t -> {em}))"
    ).cast("long")
    n_phones = F.expr(
        f"size(filter({toks}, t -> NOT {em} AND {ph}))"
    ).cast("long")
    red = F.expr(redacted_text_expr(text_col))
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        (F.expr(f"size(filter({toks}, t -> {em} OR {ph}))") > 0).alias(
            "has_pii"
        ),
        F.md5(red).alias("redacted_md5"),
    )


DECON_N = 13  # word n-gram width of the published decontamination rule
DECON_EVAL_MOD = 97  # deterministic synthetic eval set: doc_id % 97 == 0


def decontaminate(
    docs: DataFrame, eval_docs: DataFrame, n: int = DECON_N
) -> DataFrame:
    """Benchmark decontamination (the GPT-3/PaLM 13-gram rule): flag
    every training document sharing at least one word ``n``-gram with
    the eval set. Output per doc: distinct-gram count, distinct grams
    hit, and the contaminated flag.

    100-TB shape: eval sets are megabytes against a 100-TB corpus, so
    the distinct eval grams build on the tiny side (one small-side
    shuffle) and reach every executor as a BROADCAST hash map; the
    corpus side is explode_outer (narrow, keeps gram-less short docs)
    -> broadcast hash probe -> partial+final agg on doc_id. Exactly
    ONE corpus-side shuffle, integer counts only."""
    grams = F.expr(_grams_expr(n))
    eval_grams = (
        eval_docs.select(F.explode(grams).alias("gram")).distinct()
    )
    per_gram = (
        docs.select(
            "doc_id",
            F.explode_outer(F.array_distinct(grams)).alias("gram"),
        )
        .join(
            F.broadcast(eval_grams.withColumn("hit", F.lit(1))),
            "gram",
            "left",
        )
    )
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.count("gram").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("hits"),
        )
        .withColumn("contaminated", F.col("hits") > 0)
    )


def vocab_topk(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus word-frequency top-k with a total deterministic order
    (count DESC, word ASC). groupBy(word) partial-aggregates map-side
    — the Zipf head never travels as raw occurrences — and the final
    top-k is a TakeOrdered, not a global sort."""
    words = docs.select(F.explode(tokens_col(F.col("text"))).alias("word"))
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(k)
    )


def span_dedup(
    docs: DataFrame, n: int = SPAN_N, min_df: int = SPAN_DF
) -> DataFrame:
    """C4-style duplicated-span REMOVAL with text reconstruction: any
    word position covered by an occurrence of a corpus-hot n-gram
    (document frequency >= min_df — the boilerplate hot set) is
    dropped, and the document text is rebuilt from the surviving
    words. Returns (doc_id, n_words, n_dropped, clean_md5) where
    clean_md5 = md5 of the rebuilt text ('' if everything dropped) —
    the hash makes the reconstruction byte-auditable cross-engine
    without shipping rebuilt text to the driver.

    Plan: hot set via dedup.ngram_doc_freq (size-aware broadcast),
    gram-position explode + semi-join, per-doc position cover as a
    collect_set array, rebuild via JVM filter/transform lambdas."""
    from ..plans.hints import size_aware_broadcast
    from .dedup import ngram_doc_freq

    hot = size_aware_broadcast(
        ngram_doc_freq(docs, n)
        .filter(F.col("df") >= min_df)
        .select("ngram_md5")
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"if(size(split(text, ' ')) >= {n},"
                f" transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> struct(i AS i, md5(concat_ws(' ', slice(split(text, ' '), i, {n}))) AS g)),"
                f" array())"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("ngram_md5"))
    cover = (
        grams.join(hot, "ngram_md5", "left_semi")
        .select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(i, i + {n - 1})")
            ).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("dropped"))
    )
    rebuilt = (
        docs.join(cover, "doc_id", "left")
        .select(
            "doc_id",
            F.expr("size(split(text, ' '))").cast("long").alias("n_words"),
            F.coalesce(
                F.size("dropped").cast("long"), F.lit(0).cast("long")
            ).alias("n_dropped"),
            F.md5(
                F.when(
                    F.col("dropped").isNull(), F.col("text")
                ).otherwise(
                    F.expr(
                        "concat_ws(' ', transform(filter("
                        "  transform(split(text, ' '), (w, i) -> struct(i + 1 AS p, w AS w)),"
                        "  s -> NOT array_contains(dropped, s.p)), s -> s.w))"
                    )
                )
            ).alias("clean_md5"),
        )
    )
    return rebuilt


def substring_dedup(docs: DataFrame, n: int = SUBSTR_N) -> DataFrame:
    """Exact cross-document substring deduplication (the Lee et al.
    2022 'Deduplicating Training Data Makes Language Models Better'
    memorization control): any word position covered by an n-gram
    that occurs in MORE THAN ONE DISTINCT DOCUMENT is removed, and
    the document is rebuilt from the surviving words. Because every
    position of a duplicated substring of length >= n is covered by
    at least one duplicated n-gram, the union of covers removes
    exactly the maximal cross-document duplicated substrings of
    length >= n — without materializing a suffix array.

    Differs from span_dedup (corpus-frequency boilerplate, df >=
    min_df): here ANY cross-document duplicate counts, which is the
    training-set memorization criterion, not the boilerplate one.

    Returns (doc_id, n_words, n_dup, n_spans, clean_md5): n_dup =
    positions removed, n_spans = number of MAXIMAL merged duplicated
    spans (a position starts a span iff its predecessor position is
    not covered — the interval merge, evaluated declaratively on the
    per-doc cover set), clean_md5 = md5 of the rebuilt text.

    100-TB plan shape: ONE gram-keyed exchange for duplicate
    detection — groupBy(gram).agg(min(doc_id), max(doc_id)) is
    map-side combinable (two longs per gram per map task, never a
    positions list, so a corpus-hot boilerplate gram cannot OOM a
    reducer), filter min != max. The gram->positions join back is a
    semi join on the gram key (size-aware broadcast when the dup set
    is small); the per-doc cover set is one doc-keyed exchange of
    bounded arrays. The GRAM exchange never carries text — only md5
    keys and int positions. The final rebuild join (docs x cover on
    doc_id) broadcasts cover below the threshold; above it (a corpus
    where duplicated docs are a large fraction) it is a doc_id-keyed
    sort-merge join, i.e. corpus text crosses at most ONE exchange —
    and zero on a corpus table bucketed by doc_id, the layout a
    100-TB dedup deployment uses (Lee et al.'s own pipeline
    co-locates text with its cover the same way)."""
    from ..plans.hints import size_aware_broadcast

    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"if(size(split(text, ' ')) >= {n},"
                f" transform(sequence(1, size(split(text, ' ')) - {n - 1}),"
                f" i -> struct(i AS i, md5(concat_ws(' ', slice(split(text, ' '), i, {n}))) AS g)),"
                f" array())"
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.i").alias("i"), F.col("s.g").alias("ngram_md5"))
    dup = size_aware_broadcast(
        grams.groupBy("ngram_md5")
        .agg(F.min("doc_id").alias("_lo"), F.max("doc_id").alias("_hi"))
        .filter(F.col("_lo") != F.col("_hi"))
        .select("ngram_md5")
    )
    cover = (
        grams.join(dup, "ngram_md5", "left_semi")
        .select(
            "doc_id",
            F.explode(F.expr(f"sequence(i, i + {n - 1})")).alias("p"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("p").alias("dropped"))
    )
    return docs.join(cover, "doc_id", "left").select(
        "doc_id",
        F.expr("size(split(text, ' '))").cast("long").alias("n_words"),
        F.coalesce(F.size("dropped").cast("long"), F.lit(0).cast("long")).alias(
            "n_dup"
        ),
        F.coalesce(
            F.expr(
                "size(filter(dropped, p -> NOT array_contains(dropped, p - 1)))"
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_spans"),
        F.md5(
            F.when(F.col("dropped").isNull(), F.col("text")).otherwise(
                F.expr(
                    "concat_ws(' ', transform(filter("
                    "  transform(split(text, ' '), (w, i) -> struct(i + 1 AS p, w AS w)),"
                    "  s -> NOT array_contains(dropped, s.p)), s -> s.w))"
                )
            )
        ).alias("clean_md5"),
    )


# hashing-trick classifier contract (committed): feature space =
# unigrams + bigrams, D hash buckets, integer weights derived from
# the bucket id by the repo-wide overflow-safe LCG mix. A real
# deployment broadcasts LEARNED float weights; deriving them from the
# committed formula keeps the exact same plan shape (per-feature
# weight lookup + per-doc sum) while making the scores int64 so the
# DuckDB oracle reproduces them bit-exactly.
CLS_BUCKETS = 4096
CLS_LCG_A = 1103515245
CLS_LCG_C = 12345
CLS_LCG_M = 2147483648
CLS_WRANGE = 2001  # weights in [-1000, 1000]


def _weight_sql(feat: str) -> str:
    """Dialect-NEUTRAL weight-of-feature SQL except the hex->int64
    cast, which each engine spells differently (hash48 passed in)."""
    return (
        f"((({feat} % {CLS_BUCKETS}) * {CLS_LCG_A} + {CLS_LCG_C})"
        f" % {CLS_LCG_M}) % {CLS_WRANGE} - 1000"
    )


def classifier_scores(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """fastText-shaped model-based quality filter (inference only):
    unigram+bigram features -> hashing trick into CLS_BUCKETS ->
    per-feature integer weight -> per-document score sum ->
    keep = score >= 0. This is the 'model-based quality classifier'
    stage of modern curation pipelines (CCNet/DCLM-style), with the
    learned weight vector replaced by the committed deterministic
    formula so the score is exact int64 cross-engine.

    100-TB shape: FULLY NARROW — per-row array lambdas over the token
    list, no shuffle, no join, no Python; fuses with the scan. The
    weight 'vector' costs nothing to ship because it is a formula; a
    learned vector would be a broadcast lookup in the same plan
    position."""
    toks = f"split({text_col}, ' ')"
    feats = f"concat({toks}, {_grams_expr(2, toks)})"
    h48 = "cast(conv(substring(md5(f), 1, 12), 16, 10) as bigint)"
    score = F.expr(
        f"aggregate({feats}, 0L, (acc, f) -> acc + ({_weight_sql(h48)}))"
    )
    n_feats = F.expr(f"size({feats})").cast("long")
    return docs.select(
        "doc_id",
        F.coalesce(n_feats, F.lit(0).cast("long")).alias("n_features"),
        F.coalesce(score, F.lit(0).cast("long")).alias("score"),
        (
            F.col(text_col).isNotNull() & (F.coalesce(score, F.lit(0)) >= 0)
        ).alias("keep"),
    )


def blocklist_stats(
    docs: DataFrame, words: list[str], text_col: str = "text"
) -> DataFrame:
    """Blocklist-word filtering (the C4 'bad words' stage, list as a
    parameter): per doc, the count and character-exact fraction of
    blocked tokens, and the keep verdict (zero hits). The list is a
    compile-time literal IN-set — small by nature (hundreds of
    words), so the predicate stays whole-stage codegen with no join
    at all; fully narrow at any corpus size."""
    if not words:
        raise ValueError("blocklist is empty")
    lst = ", ".join("'" + w.replace("'", "''") + "'" for w in sorted(words))
    toks = f"split({text_col}, ' ')"
    n_blocked = F.expr(
        f"size(filter({toks}, t -> t IN ({lst})))"
    ).cast("long")
    n_tokens = F.expr(f"size({toks})").cast("long")
    return docs.select(
        "doc_id",
        n_blocked.alias("n_blocked"),
        n_tokens.alias("n_tokens"),
        (
            n_blocked.cast("double") / n_tokens.cast("double")
        ).alias("blocked_frac"),
        (n_blocked == 0).alias("keep"),
    )
