"""operators.quality: Gopher repetition, C4 quality filter, vocab
top-k, span dedup — hand-computed contracts + plan shapes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from geokit_spark.operators import quality as Q


@pytest.fixture(scope="module")
def spark():
    from geokit_spark.session import get_spark

    return get_spark("test-quality", cores=4, shuffle_partitions=4)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_gopher_repetition_hand_case(spark):
    # grams(n=2): 'a b' x2, 'b a' x2, 'a c' x1 -> top tie broken
    # lexicographically ascending -> 'a b'
    out = Q.gopher_repetition(_docs(spark, ["a b a b a c"])).collect()[0]
    assert out.top2_gram == "a b"
    assert out.top2_cnt == 2
    assert out.top2_frac == 2 * 3 / 11
    assert out.dup2_frac == (2 * 3 + 2 * 3) / 11
    # n=3: 'a b a' x2? grams: 'a b a','b a b','a b a','b a c' -> 'a b a' x2
    assert out.top3_gram == "a b a"
    assert out.top3_cnt == 2
    assert out.dup3_frac == (2 * 5) / 11


def test_gopher_repetition_short_doc_zeroes(spark):
    out = Q.gopher_repetition(_docs(spark, ["single"])).collect()[0]
    assert out.top2_gram == "" and out.top2_cnt == 0
    assert out.top2_frac == 0.0 and out.dup3_frac == 0.0


def test_quality_filter_reasons(spark):
    rows = [
        "the " + " ".join(f"word{i}" for i in range(20)),  # ok
        "tiny doc",  # too_short
        " ".join("ab" for _ in range(30)),  # word_len_low (mean 2)
        " ".join("the" if i % 2 else "extraordinarily" for i in range(30)),
        " ".join(f"plain{i}" for i in range(30)),  # no_stopword
    ]
    out = {r.doc_id: r for r in Q.quality_filter(_docs(spark, rows)).collect()}
    assert out[0].reason == "ok" and out[0].keep
    assert out[1].reason == "too_short" and not out[1].keep
    assert out[2].reason == "word_len_low"
    assert out[3].reason == "word_len_high"
    assert out[4].reason == "no_stopword"


def test_quality_filter_is_narrow(spark):
    plan = (
        Q.quality_filter(_docs(spark, ["a b c"]))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_vocab_topk_order_and_ties(spark):
    out = Q.vocab_topk(_docs(spark, ["b a b c a b", "c a"]), k=3).collect()
    # counts: b=3, a=3, c=2 -> (3,'a'), (3,'b'), (2,'c')
    assert [(r.word, r.n) for r in out] == [("a", 3), ("b", 3), ("c", 2)]


def test_span_dedup_reconstruction(spark):
    shared = "one two three four five"
    rows = [
        f"x {shared} y",
        f"p q {shared}",
        f"{shared} tail words here",
        "no hot grams in this document at all",
    ]
    out = {
        r.doc_id: r
        for r in Q.span_dedup(_docs(spark, rows), min_df=3).collect()
    }
    # the shared 5-gram has df=3 -> its 5 positions drop in docs 0-2
    exp = {0: "x y", 1: "p q", 2: "tail words here",
           3: "no hot grams in this document at all"}
    for i, txt in exp.items():
        assert out[i].clean_md5 == hashlib.md5(txt.encode()).hexdigest()
    assert out[0].n_dropped == 5 and out[3].n_dropped == 0
    assert out[3].n_words == 8


def test_short_doc_gram_builders_do_not_crash(spark):
    """Regression: Spark sequence(1, 0) is the DESCENDING [1, 0], so
    the gram builders' old greatest(..., 0) bound crashed slice() on
    any doc shorter than n words (a 100-TB corpus always has some)."""
    from geokit_spark.operators.dedup import boilerplate_flags

    docs = _docs(spark, ["single", "two words", "a b c d e"])
    out = {r.doc_id: r for r in boilerplate_flags(docs).collect()}
    assert out[0].n_ngrams == 0 and out[0].n_boiler == 0
    rep = {r.doc_id: r for r in Q.span_dedup(docs, min_df=2).collect()}
    assert rep[0].n_dropped == 0


def test_span_dedup_full_drop(spark):
    doc = "one two three four five"
    out = {
        r.doc_id: r
        for r in Q.span_dedup(_docs(spark, [doc, doc]), min_df=2).collect()
    }
    for r in out.values():
        assert r.n_dropped == 5
        assert r.clean_md5 == hashlib.md5(b"").hexdigest()


def test_quality_filter_passthrough(spark):
    out = Q.quality_filter(
        _docs(spark, ["the quick brown fox does jump over lazy dogs ten"]),
        passthrough=("text", "lang"),
    ).collect()[0]
    assert out.text.startswith("the quick")
    assert out.lang == "en"
    # passthrough must not disturb the contract columns
    assert out.n_words == 10 and isinstance(out.keep, bool)


def test_robots_noindex_token_not_substring(spark):
    """'index, follow' must survive (substring match would kill it);
    case-folded, order-flipped, and spaced variants must all drop."""
    from geokit_spark.operators.quality import filter_noindex

    rows = [
        (1, b'<html><head><meta name="robots" content="noindex,nofollow">'
            b"</head><body></body></html>"),
        (2, b'<html><head><META NAME="ROBOTS" CONTENT="NOFOLLOW, NOINDEX">'
            b"</head><body></body></html>"),
        (3, b'<html><head><meta name="robots" content="index, follow">'
            b"</head><body></body></html>"),
        (4, b"<html><head></head><body></body></html>"),  # no meta at all
        (5, b'<html><head><meta name="robots" content=" noindex ">'
            b"</head><body></body></html>"),  # padded single token
    ]
    pages = spark.createDataFrame(rows, "doc_id long, html binary")
    kept = sorted(r.doc_id for r in filter_noindex(pages).collect())
    assert kept == [3, 4]


def test_pages_with_meta_extraction_contract(spark):
    """The injected <head> meta tag must not disturb the byte-identity
    main-text contract, and the codegen filter keeps exactly the
    closed-form arithmetic set."""
    from pyspark.sql import functions as F

    from geokit_spark.operators.quality import filter_noindex
    from geokit_spark.sources.pages import pages_with_meta

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    pages = pages_with_meta(docs.limit(80))
    from geokit_spark.sources.pages import extract_text

    ext = extract_text(pages)
    bad = (
        pages.join(ext, "url")
        .filter(F.col("text_extracted") != F.encode("text", "UTF-8"))
        .count()
    )
    assert bad == 0
    kept = filter_noindex(pages)
    ids = {r[0] for r in kept.select(
        F.element_at(F.split("url", "/"), -1).cast("long")).collect()}
    want = {
        r.doc_id for r in docs.limit(80).collect()
        if not (r.doc_id % 11 == 7 or r.doc_id % 7 == 3)
    }
    assert ids == want


def test_decontaminate_hand_case(spark):
    # eval doc "a b c d e"; training docs: an exact superstring (2
    # distinct 3-grams hit), a partial overlap (1 hit), a clean doc,
    # and a doc too short for any 3-gram (0 grams, kept via
    # explode_outer)
    docs = _docs(
        spark,
        [
            "x a b c d e y",   # 0: contains all of eval's 3-grams
            "z z b c d z z",   # 1: shares "b c d" only
            "p q r s t u v",   # 2: clean
            "m n",             # 3: no 3-gram at all
        ],
    )
    ev = _docs(spark, ["a b c d e"])
    out = {r.doc_id: r for r in Q.decontaminate(docs, ev, n=3).collect()}
    assert len(out) == 4
    # eval "a b c d e" -> grams {a b c, b c d, c d e}
    assert (out[0].hits, out[0].contaminated) == (3, True)
    assert (out[1].hits, out[1].contaminated) == (1, True)
    assert (out[2].hits, out[2].contaminated) == (0, False)
    assert (out[3].n_grams, out[3].hits, out[3].contaminated) == (
        0, 0, False,
    )


def test_decontaminate_repeated_gram_counts_once(spark):
    # the same eval gram appearing 3x in one doc counts as ONE
    # distinct hit
    docs = _docs(spark, ["a b a b a b a b"])
    ev = _docs(spark, ["a b a"])
    out = Q.decontaminate(docs, ev, n=2).collect()[0]
    # doc distinct 2-grams: {a b, b a}; eval 2-grams: {a b, b a}
    assert out.n_grams == 2 and out.hits == 2


def test_decontaminate_plan_broadcast_one_shuffle(spark):
    docs = _docs(spark, ["a b c d e f g"] * 20)
    ev = _docs(spark, ["c d e"])
    plan = (
        Q.decontaminate(docs, ev, n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pii_scrub_hand_cases(spark):
    # decoys that must NOT match: double '@', dot at domain end, empty
    # local part, empty domain-dot prefix, 6-digit run; matches: plain
    # email, 7-digit run
    docs = _docs(
        spark,
        [
            "mail bob@site.org now",          # 0: one email
            "call 5551234 ok",                # 1: one phone
            "a@@b.c dot@end. @start.com x@.y 123456",  # 2: all decoys
            "bob@site.org 5551234",           # 3: both
            "plain words only here",          # 4: clean
        ],
    )
    out = {r.doc_id: r for r in Q.pii_scrub(docs).collect()}
    assert (out[0].n_emails, out[0].n_phones, out[0].has_pii) == (1, 0, True)
    assert (out[1].n_emails, out[1].n_phones, out[1].has_pii) == (0, 1, True)
    assert (out[2].n_emails, out[2].n_phones, out[2].has_pii) == (0, 0, False)
    assert (out[3].n_emails, out[3].n_phones) == (1, 1)
    assert (out[4].has_pii, out[4].n_emails, out[4].n_phones) == (
        False, 0, 0,
    )
    # redaction audit: doc 3 redacts to the sentinel pair
    import hashlib

    want = hashlib.md5(b"<EMAIL> <PHONE>").hexdigest()
    assert out[3].redacted_md5 == want
    # clean doc's redacted text is the original text
    assert out[4].redacted_md5 == hashlib.md5(
        b"plain words only here"
    ).hexdigest()


def test_pii_scrub_is_narrow(spark):
    docs = _docs(spark, ["bob@site.org 5551234"] * 10)
    plan = (
        Q.pii_scrub(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_blocklist_stats(spark):
    docs = _docs(
        spark,
        ["bad word here", "all clean text", "bad bad bad"],
    )
    out = {
        r.doc_id: r
        for r in Q.blocklist_stats(docs, ["bad", "unused"]).collect()
    }
    assert (out[0].n_blocked, out[0].keep) == (1, False)
    assert out[0].blocked_frac == 1 / 3
    assert (out[1].n_blocked, out[1].keep) == (0, True)
    assert (out[2].n_blocked, out[2].blocked_frac) == (3, 1.0)
    # quoting safety + empty list guard
    import pytest as _pt

    with _pt.raises(ValueError):
        Q.blocklist_stats(docs, [])
    ok = Q.blocklist_stats(docs, ["it's"]).collect()
    assert all(r.n_blocked == 0 for r in ok)
    plan = (
        Q.blocklist_stats(docs, ["bad"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_substring_dedup_cross_doc_only(spark):
    """Lee-et-al semantics: a span duplicated ACROSS documents is
    removed from every document carrying it; a span repeated only
    WITHIN one document is kept (min(doc)==max(doc) is not a
    cross-doc duplicate)."""
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"          # exactly n=8 words
    rows = [
        f"{shared} i j",                         # doc 0: span at 1-8
        f"x {shared} y z",                       # doc 1: span at 2-9
        f"{shared} mid {shared}",                # doc 2: twice
        "u1 u2 u3 u4 u5 u6 u7 u8 u9 u1 u2 u3 u4 u5 u6 u7 u8 u9",
    ]
    out = {
        r.doc_id: r for r in Q.substring_dedup(_docs(spark, rows)).collect()
    }
    exp = {0: "i j", 1: "x y z", 2: "mid", 3: rows[3]}
    for i, txt in exp.items():
        assert out[i].clean_md5 == hashlib.md5(txt.encode()).hexdigest(), i
    assert out[0].n_dup == 8 and out[0].n_spans == 1
    assert out[1].n_dup == 8 and out[1].n_spans == 1
    # doc 2 carries the shared span twice -> two maximal spans
    assert out[2].n_dup == 16 and out[2].n_spans == 2
    # doc 3's repeat is intra-document only: u-grams never cross docs
    assert out[3].n_dup == 0 and out[3].n_spans == 0


def test_substring_dedup_maximal_span_merge(spark):
    """Overlapping duplicated 8-grams of one long shared run must
    merge into ONE maximal span, not per-gram islands."""
    run = " ".join(f"s{i}" for i in range(14))  # 14-word shared run
    rows = [f"{run} tail0", f"head1 {run}", "solo doc with unique words"]
    out = {
        r.doc_id: r for r in Q.substring_dedup(_docs(spark, rows)).collect()
    }
    assert out[0].n_dup == 14 and out[0].n_spans == 1
    assert out[0].clean_md5 == hashlib.md5(b"tail0").hexdigest()
    assert out[1].n_dup == 14 and out[1].n_spans == 1
    assert out[2].n_dup == 0


def test_classifier_scores_hand_case(spark):
    """Recompute the committed hash->weight formula in Python for a
    tiny doc and pin the exact int64 score."""
    text = "alpha beta gamma"
    feats = ["alpha", "beta", "gamma", "alpha beta", "beta gamma"]

    def w(f):
        h = int(hashlib.md5(f.encode()).hexdigest()[:12], 16)
        return (
            (h % Q.CLS_BUCKETS) * Q.CLS_LCG_A + Q.CLS_LCG_C
        ) % Q.CLS_LCG_M % Q.CLS_WRANGE - 1000

    exp = sum(w(f) for f in feats)
    out = Q.classifier_scores(_docs(spark, [text])).collect()[0]
    assert out.n_features == 5
    assert out.score == exp
    assert out.keep == (exp >= 0)


def test_classifier_scores_null_and_single_word(spark):
    df = spark.createDataFrame(
        [(0, None), (1, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in Q.classifier_scores(df).collect()}
    assert out[0].n_features == 0 and out[0].score == 0
    assert out[0].keep is False                   # NULL text never kept
    assert out[1].n_features == 1                 # no bigram from 1 word


def test_classifier_scores_is_narrow(spark):
    plan = Q.classifier_scores(
        _docs(spark, ["a b c"])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
