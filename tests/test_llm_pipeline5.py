"""Semantic checks for the decontamination / quality / ordering ops (pipeline 5).

Exact-value parity vs DuckDB is covered for every spec by test_oracle_parity;
these tests assert the *semantics* that parity alone can't see (set relations
between eval and train slices, permutation properties of the shuffle order).
"""

from __future__ import annotations

from hudi_examples_spark.operators.llm_pipeline5 import (
    EVAL_MOD,
    N_SHARDS,
    dedup_cross_corpus,
    pipe_decontaminate,
    pipe_shuffle_order,
    text_quality_score,
    text_repetition_filter,
)
from tests.conftest import SF_SMALL


def test_decontaminate_excludes_eval_and_flags_overlap(spark):
    out = pipe_decontaminate(spark, SF_SMALL).collect()
    ids = [r["doc_id"] for r in out]
    assert all(i % EVAL_MOD != 0 for i in ids), "eval docs must not appear in train output"
    flagged = [r for r in out if r["contaminated"]]
    clean = [r for r in out if not r["contaminated"]]
    assert flagged and clean, "fixture should produce both contaminated and clean docs"
    assert all(r["n_overlap"] > 0 for r in flagged)
    assert all(r["n_overlap"] == 0 for r in clean)


def test_cross_corpus_dedup_is_subset_of_train(spark):
    kept = {r["doc_id"] for r in dedup_cross_corpus(spark, SF_SMALL).collect()}
    assert kept and all(i % EVAL_MOD != 0 for i in kept)


def test_repetition_signals_bounded(spark):
    rows = text_repetition_filter(spark, SF_SMALL).collect()
    assert len(rows) == 500
    for r in rows:
        assert 0.0 <= r["dup_bigram_frac"] <= 1.0
        assert 0.0 <= r["top_word_frac"] <= 1.0
    # the synthetic docs repeat a tiny vocabulary, so repeated bigrams exist
    assert any(r["dup_bigram_frac"] > 0 for r in rows)


def test_quality_bands_match_thresholds(spark):
    for r in text_quality_score(spark, SF_SMALL).collect():
        n, q = r["n_words"], r["q_num"]
        expected = "high" if q >= 10000 * n else ("mid" if q >= 6000 * n else "low")
        assert r["band"] == expected


def test_shuffle_order_is_sharded_permutation(spark):
    rows = pipe_shuffle_order(spark, SF_SMALL).collect()
    assert {r["doc_id"] for r in rows} == set(range(500))  # a permutation, nothing lost
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r["shard"] < N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), f"shard {shard} positions dense"
    # deterministic: a second run yields the identical order
    again = pipe_shuffle_order(spark, SF_SMALL).collect()
    assert [(r["doc_id"], r["shard"], r["pos"]) for r in rows] == [
        (r["doc_id"], r["shard"], r["pos"]) for r in again
    ]
