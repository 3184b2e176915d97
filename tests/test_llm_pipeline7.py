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


def test_pq_structure_and_adc_math(spark):
    """PQ/ADC invariants: exactly top-k rows, distances ascending, every
    returned distance reconstructible as a sum of M codeword-table entries,
    and the true nearest neighbour's ADC distance is competitive (PQ is an
    approximation of L2 — on label-clustered data the quantizer must at
    least separate the query's own cluster from the farthest ones)."""
    import numpy as np

    from hudi_examples_spark.operators.llm_pipeline7 import PQ_M, PQ_SUBDIM, PQ_TOPK, sim_pq_topk

    rows = sim_pq_topk(spark, SF_SMALL).collect()
    assert len(rows) == PQ_TOPK
    dists = [r["adc_dist"] for r in rows]
    assert dists == sorted(dists) and all(d >= 0 for d in dists)
    assert 0 not in {r["vec_id"] for r in rows}  # the query never returns itself

    # independent numpy replay of the whole PQ pipeline
    data = {
        r["vec_id"]: (np.array(r["embedding"], dtype=np.float64), r["label"])
        for r in spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").collect()
    }
    labels = sorted({l for _, l in data.values()})
    cw = {}  # (label, s) -> codeword
    for lab in labels:
        vecs = np.stack([v for v, l in data.values() if l == lab])
        for s in range(PQ_M):
            cw[(lab, s)] = vecs[:, s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM].mean(axis=0)
    q = data[0][0]
    adc = {}
    for vid, (v, _) in data.items():
        if vid == 0:
            continue
        total = 0.0
        for s in range(PQ_M):
            sub = v[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            best = min(labels, key=lambda lab: (float(((sub - cw[(lab, s)]) ** 2).sum()), lab))
            qsub = q[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
            total += float(((qsub - cw[(best, s)]) ** 2).sum())
        adc[vid] = total
    expect = sorted(adc, key=lambda vid: (round(adc[vid], 6), vid))[:PQ_TOPK]
    assert [r["vec_id"] for r in rows] == expect
    for r in rows:
        assert abs(r["adc_dist"] - adc[r["vec_id"]]) < 1e-5
