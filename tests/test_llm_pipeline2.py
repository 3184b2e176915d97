"""Tests for the second LLM-pipeline battery (llm_pipeline2).

The oracle-gated ops are covered by test_oracle_parity; here we verify the
approximate path the driver can't diff: multi-table LSH embedding near-dup
must recover planted near-duplicate pairs with high recall, and its scores
must agree exactly with the exact cosine computation.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType, LongType, StructField, StructType

from hudi_examples_spark.functions.vectors import cosine_similarity
from hudi_examples_spark.operators.llm_pipeline2 import embed_near_dup_pairs

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


@pytest.fixture(scope="module")
def planted(spark):
    """200 random base vectors + 40 near-duplicates (small perturbation of the
    first 40), so pairs (i, 1000+i) have cosine ≥ ~0.99."""
    rng = np.random.default_rng(11)
    base = rng.standard_normal((200, 64)).astype(np.float32)
    rows = [(int(i), base[i].tolist()) for i in range(200)]
    for i in range(40):
        dup = base[i] + 0.05 * rng.standard_normal(64).astype(np.float32)
        rows.append((int(1000 + i), dup.tolist()))
    return spark.createDataFrame(rows, SCHEMA)


def test_ann_recall_on_planted_dups(planted):
    got = embed_near_dup_pairs(planted, threshold=0.9).collect()
    found = {(r.d1, r.d2) for r in got}
    expected = {(i, 1000 + i) for i in range(40)}
    recall = len(found & expected) / len(expected)
    assert recall >= 0.95, f"LSH near-dup recall {recall} below 0.95: missing {expected - found}"


def test_ann_scores_match_exact_cosine(planted):
    """Every candidate the ANN path emits is rescored exactly — its cos_sim must
    equal the brute-force cosine for that pair."""
    got = embed_near_dup_pairs(planted, threshold=0.9)
    a = planted.select(F.col("vec_id").alias("d1"), F.col("embedding").alias("e1"))
    b = planted.select(F.col("vec_id").alias("d2"), F.col("embedding").alias("e2"))
    exact = (
        a.join(b, F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.round(cosine_similarity("e1", "e2"), 6).alias("exact_sim"))
    )
    joined = got.join(exact, ["d1", "d2"]).collect()
    assert len(joined) == got.count()
    for r in joined:
        assert r.cos_sim == r.exact_sim, f"pair ({r.d1},{r.d2}): {r.cos_sim} != {r.exact_sim}"


def test_ann_no_false_positives_below_threshold(planted):
    got = embed_near_dup_pairs(planted, threshold=0.9).collect()
    assert all(r.cos_sim >= 0.9 for r in got)
