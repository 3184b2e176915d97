"""BM25 retrieval and DSIR importance-affinity semantics."""

from __future__ import annotations

import math

from hudi_examples_spark.operators.llm_pipeline7 import (
    BM25_B,
    BM25_K1,
    BM25_TERMS,
    BM25_TOPK,
    DSIR_TARGET_SOURCE,
    pipe_dsir_affinity,
    text_bm25_topk,
)
from tests.conftest import SF_SMALL


def _tokenized(spark):
    rows = spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    return {r["doc_id"]: ([w for w in r["text"].strip().split(" ") if w], r["source"]) for r in rows}


def test_bm25_matches_hand_computation(spark):
    toks = _tokenized(spark)
    n = sum(1 for ws, _ in toks.values() if True)
    avgdl = sum(len(ws) for ws, _ in toks.values()) / n
    df = {t: sum(1 for ws, _ in toks.values() if t in ws) for t in BM25_TERMS}
    scores = {}
    for did, (ws, _) in toks.items():
        s, terms = 0.0, 0
        for t in BM25_TERMS:
            tf = ws.count(t)
            if not tf:
                continue
            terms += 1
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            sat = (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(ws) / avgdl)
            )
            s += idf * sat
        if terms:
            scores[did] = (round(s, 4), terms)
    expect = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:BM25_TOPK]
    got = text_bm25_topk(spark, SF_SMALL).collect()
    assert [(r["doc_id"], (r["score"], r["n_terms"])) for r in got] == expect


def test_bm25_scores_positive_and_bounded(spark):
    # Robertson +1 idf guard: every matched doc scores strictly positive, and
    # the per-term addend is bounded by idf * (k1 + 1).
    rows = text_bm25_topk(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= BM25_TOPK
    for r in rows:
        assert r["score"] > 0
        assert 1 <= r["n_terms"] <= len(BM25_TERMS)


def _bigrams(ws):
    return [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def test_dsir_affinity_matches_hand_computation(spark):
    toks = _tokenized(spark)
    c_r: dict[str, int] = {}
    c_t: dict[str, int] = {}
    for ws, src in toks.values():
        for f in _bigrams(ws):
            c_r[f] = c_r.get(f, 0) + 1
            if src == DSIR_TARGET_SOURCE:
                c_t[f] = c_t.get(f, 0) + 1
    got = {r["doc_id"]: r for r in pipe_dsir_affinity(spark, SF_SMALL).collect()}
    docs_with_features = {d for d, (ws, _) in toks.items() if len(ws) >= 2}
    assert set(got) == docs_with_features
    for did in docs_with_features:
        ws, _ = toks[did]
        per = {}
        for f in _bigrams(ws):
            per[f] = per.get(f, 0) + 1
        t_mass = sum(nf * (c_t.get(f, 0) + 1) for f, nf in per.items())
        r_mass = sum(nf * (c_r[f] + 1) for f, nf in per.items())
        r = got[did]
        assert (r["t_mass"], r["r_mass"]) == (t_mass, r_mass)
        assert r["affinity_milli"] == (1000 * t_mass) // r_mass


def test_dsir_target_docs_rank_high(spark):
    # Documents from the target subcorpus share their own bigrams, so their
    # mean affinity must exceed the non-target mean (the DSIR premise).
    toks = _tokenized(spark)
    src = {d: s for d, (ws, s) in toks.items() if len(ws) >= 2}
    rows = pipe_dsir_affinity(spark, SF_SMALL).collect()
    t = [r["affinity_milli"] for r in rows if src[r["doc_id"]] == DSIR_TARGET_SOURCE]
    o = [r["affinity_milli"] for r in rows if src[r["doc_id"]] != DSIR_TARGET_SOURCE]
    assert t and o
    assert sum(t) / len(t) > sum(o) / len(o)
