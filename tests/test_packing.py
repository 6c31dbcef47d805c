"""operators.packing: concat-and-chunk sequence packing — hand
cases, stream-contiguity invariants, parallelism invariance."""

import pytest
from pyspark.sql import functions as F

from geokit_spark.operators.packing import pack_sequences, packing_stats


@pytest.fixture(scope="module")
def spark():
    from geokit_spark.session import get_spark

    return get_spark("test-packing", cores=4, shuffle_partitions=4)


def _docs(spark, rows):
    """rows = [(doc_id, lang, text)]"""
    return spark.createDataFrame(
        [(i, lang, t) for i, lang, t in rows],
        "doc_id long, lang string, text string",
    )


def test_hand_case_offsets_and_bins(spark):
    # 3 docs, one shard, context_len=4:
    #   d0: 3 tokens -> [0,3) bins 0..0
    #   d1: 3 tokens -> [3,6) bins 0..1  (crosses the cut at 4)
    #   d2: 2 tokens -> [6,8) bins 1..1
    docs = _docs(
        spark,
        [
            (0, "en", "a b c"),
            (1, "en", "d e f"),
            (2, "en", "g h"),
        ],
    )
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, context_len=4, shard_docs=256).collect()
    }
    assert (out[0].start_off, out[0].bin_first, out[0].bin_last) == (0, 0, 0)
    assert (out[1].start_off, out[1].bin_first, out[1].bin_last) == (3, 0, 1)
    assert (out[2].start_off, out[2].bin_first, out[2].bin_last) == (6, 1, 1)
    assert not out[0].crosses and out[1].crosses and not out[2].crosses


def test_stream_contiguity_invariant(spark):
    # Within every (lang, shard) stream, sorted by doc_id, each doc's
    # start_off equals the previous doc's start_off + n_tokens — the
    # stream is a gap-free concatenation.
    rows = [
        (i, "en" if i % 3 else "de", " ".join(["tok"] * (1 + i % 7)))
        for i in range(200)
    ]
    packed = pack_sequences(_docs(spark, rows), context_len=16, shard_docs=32)
    from pyspark.sql import Window

    w = Window.partitionBy("lang", "shard").orderBy("doc_id")
    bad = (
        packed.withColumn(
            "expect",
            F.coalesce(
                F.lag(F.col("start_off") + F.col("n_tokens")).over(w),
                F.lit(0),
            ),
        )
        .filter(F.col("start_off") != F.col("expect"))
        .count()
    )
    assert bad == 0


def test_empty_doc_one_token_convention(spark):
    # the shared whitespace tokenizer (engine AND DuckDB oracle) maps
    # empty text to one empty-string token: split('') = [''] — so an
    # empty doc occupies exactly one slot in the stream
    docs = _docs(spark, [(0, "en", "a b"), (1, "en", ""), (2, "en", "c")])
    out = {
        r.doc_id: r
        for r in pack_sequences(docs, context_len=2, shard_docs=256).collect()
    }
    assert out[1].n_tokens == 1
    assert out[1].start_off == 2
    assert out[1].bin_first == out[1].bin_last == 1
    assert not out[1].crosses
    assert out[2].start_off == 3


def test_parallelism_invariance(spark):
    rows = [
        (i, ["en", "de", "fr"][i % 3], " ".join(["w%d" % (i % 5)] * (1 + i % 11)))
        for i in range(500)
    ]
    docs = _docs(spark, rows)
    a = packing_stats(
        pack_sequences(docs.repartition(1), context_len=512, shard_docs=64)
    ).orderBy("lang")
    b = packing_stats(
        pack_sequences(docs.repartition(16), context_len=512, shard_docs=64)
    ).orderBy("lang")
    assert [r.asDict() for r in a.collect()] == [
        r.asDict() for r in b.collect()
    ]


def test_plan_shape_single_exchange_before_agg(spark):
    # pack_sequences itself is one hash exchange on (lang, shard) +
    # an in-partition sort — no global sort (Exchange rangepartitioning)
    rows = [(i, "en", "a b c") for i in range(50)]
    packed = pack_sequences(_docs(spark, rows), context_len=8, shard_docs=8)
    plan = packed._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" not in plan.lower()
    assert plan.lower().count("exchange hashpartitioning") == 1


def test_corpus_shuffle_is_permutation(spark):
    from geokit_spark.operators.packing import corpus_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(300)], "doc_id long"
    )
    out = corpus_shuffle(docs, n_shards=8).collect()
    assert len(out) == 300
    assert {r.doc_id for r in out} == set(range(300))
    # per-shard positions are exactly 0..n_shard-1 (dense rank, no
    # gaps, no dupes)
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # the permutation actually shuffles: within some shard, ascending
    # pos does not mean ascending doc_id
    scrambled = any(
        [d for _, d in sorted(
            (r.pos, r.doc_id) for r in out if r.shard == s
        )] != sorted(
            r.doc_id for r in out if r.shard == s
        )
        for s in by_shard
    )
    assert scrambled


def test_corpus_shuffle_parallelism_invariant(spark):
    from geokit_spark.operators.packing import corpus_shuffle

    docs = spark.createDataFrame(
        [(i,) for i in range(500)], "doc_id long"
    )
    a = sorted(
        map(tuple, corpus_shuffle(docs.repartition(1), 8).collect())
    )
    b = sorted(
        map(tuple, corpus_shuffle(docs.repartition(16), 8).collect())
    )
    assert a == b


def test_chunk_documents_hand_case(spark):
    from geokit_spark.operators.packing import chunk_documents

    import hashlib

    # 10 tokens, chunk=4, overlap=1 -> stride 3 -> starts 0,3,6 cover
    # tokens 0-3,3-6,6-9 (formula: (10-4+2)//3+1 = 3 chunks)
    toks = "a b c d e f g h i j".split()
    docs = spark.createDataFrame(
        [(0, " ".join(toks))], "doc_id long, text string"
    )
    out = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.start_tok, r.n_tok) for r in out] == [
        (0, 4), (3, 4), (6, 4),
    ]
    for r in out:
        want = " ".join(toks[r.start_tok : r.start_tok + 4])
        assert r.chunk_md5 == hashlib.md5(want.encode()).hexdigest()


def test_chunk_documents_short_doc_single_chunk(spark):
    from geokit_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "x")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert len(out) == 2
    assert all(r.chunk_id == 0 and r.start_tok == 0 for r in out)
    assert {r.doc_id: r.n_tok for r in out} == {0: 2, 1: 1}


def test_chunk_documents_is_narrow(spark):
    from geokit_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [(i, "a b c d e f g h") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        chunk_documents(docs, 4, 1)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_chunk_documents_rejects_bad_overlap(spark):
    from geokit_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    import pytest as _pt

    for ov in (-1, 8, 9):
        with _pt.raises(ValueError):
            chunk_documents(docs, chunk_tokens=8, overlap=ov)
