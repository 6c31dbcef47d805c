"""Sampling / centroid / normalization pipeline ops."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from geokit_spark.operators.sampling import (
    SAMPLE_MOD, embedding_centroids, normalize_text, stratified_sample,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_stratified_sample_deterministic_and_bounded(spark, docs):
    fr = {"en": 0.5, "de": 0.25}
    a = stratified_sample(docs, fr).toPandas().sort_values("doc_id")
    b = stratified_sample(docs, fr).toPandas().sort_values("doc_id")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()  # reproducible
    per = a.groupby("lang").size()
    tot = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    assert set(per.index) <= {"en", "de"}  # unlisted strata dropped
    for lang, f in fr.items():
        got = per.get(lang, 0) / tot[lang]
        assert abs(got - f) < 0.15  # hash-uniformity at n~100


def test_embedding_centroids_match_numpy(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = embedding_centroids(emb).toPandas()
    pdf = emb.toPandas()
    lab = pdf["label"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    for label in np.unique(lab)[:3]:
        m = mat[lab == label].mean(axis=0)
        rows = out[out["label"] == label].sort_values("pos")
        assert (rows["n_vecs"] == (lab == label).sum()).all()
        assert np.array_equal(
            rows["mean_q"].to_numpy(), np.floor(m * 1e4).astype(np.int64)
        )


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [(1, "  Hello\t\tWorld \n"), (2, "hello world"), (3, "HELLO  WORLD")],
        "doc_id long, text string",
    )
    out = normalize_text(df).toPandas().set_index("doc_id")
    assert out.loc[1, "norm_md5"] == out.loc[2, "norm_md5"]
    assert out.loc[2, "norm_md5"] == out.loc[3, "norm_md5"]
    assert out.loc[1, "n_norm"] == 11


def test_mix_weights_exact_integer_scheme(spark):
    import math

    from geokit_spark.operators.sampling import mix_weights

    rows = []
    did = 0
    for lang, n, words in (("en", 40, 9), ("de", 10, 4), ("fr", 5, 25)):
        for _ in range(n):
            rows.append((did, lang, " ".join(["w"] * words)))
            did += 1
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    out = {r.lang: r for r in mix_weights(df, budget=10**9).collect()}
    tot = {"en": 40 * 9, "de": 10 * 4, "fr": 5 * 25}
    nums = {k: math.isqrt(v) for k, v in tot.items()}
    denom = sum(nums.values())
    for k, r in out.items():
        assert r.total_tokens == tot[k]
        assert r.w_num == nums[k]
        assert r.weight == nums[k] / denom
        assert r.alloc_tokens == (10**9 * nums[k]) // denom
    # allocation never exceeds the budget
    assert sum(r.alloc_tokens for r in out.values()) <= 10**9
    # invariant under repartitioning
    out2 = {
        r.lang: r
        for r in mix_weights(df.repartition(13), budget=10**9).collect()
    }
    assert {k: (v.w_num, v.weight, v.alloc_tokens) for k, v in out.items()} == {
        k: (v.w_num, v.weight, v.alloc_tokens) for k, v in out2.items()
    }
