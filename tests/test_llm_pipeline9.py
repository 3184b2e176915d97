"""Paragraph-level dedup and semantic decontamination — planted-data semantics."""

from __future__ import annotations

import glob
import shutil

from hudi_examples_spark.operators.llm_pipeline9 import (
    SEMANTIC_DECON_THRESHOLD,
    pipe_paragraph_dedup,
    pipe_semantic_decontaminate,
)


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    shutil.copy(
        glob.glob(str(tmp_path / "docs" / "*.parquet"))[0],
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _write_embeddings(spark, tmp_path, rows):
    df = spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in rows],
        "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embs"))
    shutil.copy(
        glob.glob(str(tmp_path / "embs" / "*.parquet"))[0],
        str(tmp_path / "embeddings.parquet"),
    )


# ---------------------------------------------------------------------------
# pipe_paragraph_dedup
# ---------------------------------------------------------------------------


def test_planted_boilerplate_paragraph_first_occurrence_wins(spark, tmp_path):
    # 'the' is a paragraph boundary; boilerplate "p1 p2 p3" appears in docs
    # 1, 2, and 4 — the corpus-wide first occurrence (doc 1, pos 1) keeps it,
    # every later copy is removed.
    sf = _write_docs(
        spark,
        tmp_path,
        [
            (1, "p1 p2 p3 the q1 q2"),  # keeper of the boilerplate
            (2, "z1 the p1 p2 p3"),  # later copy → removed
            (3, "w1 w2 the w1 w2"),  # intra-doc repeat → 2nd removed
            (4, "p1 p2 p3"),  # nothing but the boilerplate → fully dup
        ],
    )
    rep = {r["doc_id"]: r for r in pipe_paragraph_dedup(spark, sf).collect()}
    assert rep[1]["n_paras"] == 2 and rep[1]["dup_paras"] == 0
    assert rep[1]["n_tokens"] == 5 and rep[1]["kept_tokens"] == 5
    assert rep[2]["n_paras"] == 2 and rep[2]["dup_paras"] == 1
    assert rep[2]["dup_tokens"] == 3 and rep[2]["kept_tokens"] == 1
    assert rep[3]["n_paras"] == 2 and rep[3]["dup_paras"] == 1
    assert rep[3]["dup_tokens"] == 2 and rep[3]["kept_tokens"] == 2
    assert rep[4]["n_paras"] == 1 and rep[4]["dup_paras"] == 1
    assert rep[4]["fully_dup"] == 1 and rep[4]["kept_tokens"] == 0
    assert all(rep[d]["fully_dup"] == 0 for d in (1, 2, 3))


def test_paragraph_dedup_boundary_tokens_carry_no_content(spark, tmp_path):
    # boundary tokens never count as paragraph tokens, and a doc whose
    # every word is a boundary token has zero paragraphs (absent from the
    # per-doc report, like windowless docs in substring dedup)
    sf = _write_docs(spark, tmp_path, [(1, "x1 the the x2"), (2, "the a the")])
    rep = {r["doc_id"]: r for r in pipe_paragraph_dedup(spark, sf).collect()}
    assert set(rep) == {1}
    assert rep[1]["n_paras"] == 2 and rep[1]["n_tokens"] == 2
    # x1 and x2 are distinct paragraphs — nothing removed
    assert rep[1]["dup_paras"] == 0


# ---------------------------------------------------------------------------
# pipe_semantic_decontaminate
# ---------------------------------------------------------------------------


def _texts_by_split(want: dict[str, int]) -> dict[str, list[str]]:
    """Brute-force texts landing in the wanted splits under the md5 content
    hash (same formula as pipe_hash_split)."""
    import hashlib

    out: dict[str, list[str]] = {k: [] for k in want}
    i = 0
    while any(len(v) < want[k] for k, v in out.items()):
        txt = f"probe text number {i}"
        h = hashlib.md5(txt.encode()).hexdigest()
        b = (ord(h[0]) * 16 + ord(h[1])) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        if split in out and len(out[split]) < want[split]:
            out[split].append(txt)
        i += 1
    return out


def test_semantic_decontaminate_flags_train_near_eval_only(spark, tmp_path):
    import numpy as np

    texts = _texts_by_split({"train": 3, "val": 1, "test": 1})
    # doc layout: 0,1,2 train; 3 val; 4 test
    docs = [
        (0, texts["train"][0]),
        (1, texts["train"][1]),
        (2, texts["train"][2]),
        (3, texts["val"][0]),
        (4, texts["test"][0]),
    ]
    sf = _write_docs(spark, tmp_path, docs)
    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    other = rng.standard_normal(64)
    # train 0 ≈ val 3 (identical embedding → cosine 1.0, collides in every
    # LSH table); train 1 ≈ train 2 (near pair INSIDE train — must NOT be
    # flagged); train 2 vs eval is random (below threshold w.h.p.)
    _write_embeddings(
        spark,
        tmp_path,
        [
            (0, base),
            (1, other),
            (2, other + rng.standard_normal(64) * 1e-3),
            (3, base),
            (4, rng.standard_normal(64)),
        ],
    )
    rep = {r["train_id"]: r for r in pipe_semantic_decontaminate(spark, sf).collect()}
    assert 0 in rep, rep
    assert rep[0]["nearest_eval_id"] == 3 and rep[0]["nearest_eval_split"] == "val"
    assert rep[0]["max_cos"] >= 0.999999
    # train-train proximity is NOT contamination; eval docs never appear as
    # train_id (eval exclusion)
    assert 1 not in rep and 2 not in rep
    assert 3 not in rep and 4 not in rep


def test_semantic_decontaminate_threshold_gates_random_pairs(spark, tmp_path):
    import numpy as np

    texts = _texts_by_split({"train": 2, "test": 1})
    docs = [(0, texts["train"][0]), (1, texts["train"][1]), (2, texts["test"][0])]
    sf = _write_docs(spark, tmp_path, docs)
    rng = np.random.default_rng(7)
    # orthogonal unit basis vectors: exact cosine 0 between any two
    _write_embeddings(
        spark,
        tmp_path,
        [(0, np.eye(64)[0]), (1, np.eye(64)[1]), (2, np.eye(64)[2])],
    )
    assert pipe_semantic_decontaminate(spark, sf).count() == 0
    assert 0 < SEMANTIC_DECON_THRESHOLD < 1


# ---------------------------------------------------------------------------
# text_vocab_coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_hand_computed(spark, tmp_path):
    from hudi_examples_spark.operators import llm_pipeline9 as m

    # corpus token counts: x appears 6x, y 3x, z 1x  (total 10)
    sf = _write_docs(spark, tmp_path, [(1, "x x x y y"), (2, "x x x y z")])
    rows = {r["top_k"]: r for r in m.text_vocab_coverage(spark, sf).collect()}
    assert set(rows) == set(m.COVERAGE_KS)
    for k in m.COVERAGE_KS:
        assert rows[k]["total_tokens"] == 10
    # smallest K (>=10 in the battery) already covers all 3 types here, so
    # assert against a direct recomputation for any K semantics
    counts = sorted([6, 3, 1], reverse=True)
    for k, r in rows.items():
        want = sum(counts[: min(k, len(counts))])
        assert r["covered_tokens"] == want
        assert r["coverage_bp"] == (10000 * want) // 10


def test_vocab_coverage_tie_groups_are_count_determined(spark, tmp_path):
    """K cutting inside an equal-count tie group: coverage depends only on
    the histogram, and partial tie-group consumption takes exactly
    (K - types_before) of the tied types' count each."""
    from hudi_examples_spark.operators import llm_pipeline9 as m
    import hudi_examples_spark.operators.llm_pipeline9 as mod

    # 12 types each with count 2, plus one type with count 5
    text1 = " ".join(f"t{i}" for i in range(12)) + " big big big"
    text2 = " ".join(f"t{i}" for i in range(12)) + " big big"
    sf = _write_docs(spark, tmp_path, [(1, text1), (2, text2)])
    rows = {r["top_k"]: r for r in m.text_vocab_coverage(spark, sf).collect()}
    # K=10: top type 'big'(5) + 9 of the twelve tied count-2 types = 5+18
    assert rows[10]["covered_tokens"] == 5 + 9 * 2
    assert rows[10]["total_tokens"] == 5 + 24


# ---------------------------------------------------------------------------
# text_bigram_lm_score
# ---------------------------------------------------------------------------


def test_bigram_lm_hand_computed(spark, tmp_path):
    from hudi_examples_spark.operators.llm_pipeline9 import (
        LM_LAMBDA_TENTHS,
        text_bigram_lm_score,
    )

    # corpus: doc1 = "a b a b", doc2 = "a b"  (avoid the para breakers'
    # special role — irrelevant here, bigram op has no separators)
    sf = _write_docs(spark, tmp_path, [(1, "u v u v"), (2, "u v")])
    # counts: C(u)=3, C(v)=3, total=6; C(u v)=3, C(v u)=1
    # p_bi(u->v) = (1000*3)//3 = 1000 ; p_uni(v) = (1000*3)//6 = 500
    # p_bi(v->u) = (1000*1)//3 = 333  ; p_uni(u) = 500
    lam, inv = LM_LAMBDA_TENTHS, 10 - LM_LAMBDA_TENTHS
    p_uv = (lam * 1000 + inv * 500) // 10
    p_vu = (lam * 333 + inv * 500) // 10
    rows = {r["doc_id"]: r for r in text_bigram_lm_score(spark, sf).collect()}
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["score_num"] == 2 * p_uv + p_vu
    assert rows[1]["avg_p_milli"] == (2 * p_uv + p_vu) // 3
    assert rows[2]["n_bigrams"] == 1 and rows[2]["score_num"] == p_uv


def test_bigram_lm_short_docs_excluded(spark, tmp_path):
    from hudi_examples_spark.operators.llm_pipeline9 import text_bigram_lm_score

    sf = _write_docs(spark, tmp_path, [(1, "solo"), (2, "p q")])
    rows = {r["doc_id"] for r in text_bigram_lm_score(spark, sf).collect()}
    assert rows == {2}


# ---------------------------------------------------------------------------
# Property: paragraph dedup vs a single-node reference implementation
# ---------------------------------------------------------------------------

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _ref_paragraph_dedup(docs: list[tuple[int, str]]) -> dict[int, tuple]:
    """Plain-Python reference of pipe_paragraph_dedup's semantics."""
    from hudi_examples_spark.operators.llm_pipeline9 import PARA_BREAKERS

    paras = []  # (doc_id, pos, tuple(words))
    for doc_id, text in docs:
        ws = [w for w in text.split() if w]
        cur: list[str] = []
        start = None
        for pos, w in enumerate(ws, start=1):
            if w in PARA_BREAKERS:
                if cur:
                    paras.append((doc_id, start, tuple(cur)))
                cur, start = [], None
            else:
                if start is None:
                    start = pos
                cur.append(w)
        if cur:
            paras.append((doc_id, start, tuple(cur)))
    seen: dict[tuple, tuple] = {}
    for doc_id, pos, p in sorted(paras, key=lambda x: (x[0], x[1])):
        seen.setdefault(p, (doc_id, pos))
    out: dict[int, list] = {}
    for doc_id, pos, p in paras:
        dup = seen[p] != (doc_id, pos)
        n, d, t, dt = out.get(doc_id, (0, 0, 0, 0))
        out[doc_id] = [n + 1, d + int(dup), t + len(p), dt + len(p) * int(dup)]
    return {
        doc_id: (n, d, t, dt, t - dt, int(d == n))
        for doc_id, (n, d, t, dt) in out.items()
    }


_word_st = st.sampled_from(["the", "a", "x1", "x2", "y", "zz", "q7", "boil"])


@settings(
    max_examples=int(os.environ.get("PROP_EXAMPLES", "6")),
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(
    corpus=st.lists(
        st.lists(_word_st, min_size=0, max_size=14), min_size=1, max_size=6
    )
)
def test_paragraph_dedup_matches_reference(spark, tmp_path_factory, corpus):
    docs = [(i, " ".join(ws)) for i, ws in enumerate(corpus)]
    sf = _write_docs(spark, tmp_path_factory.mktemp("pd"), docs)
    got = {
        r["doc_id"]: (
            r["n_paras"], r["dup_paras"], r["n_tokens"],
            r["dup_tokens"], r["kept_tokens"], r["fully_dup"],
        )
        for r in pipe_paragraph_dedup(spark, sf).collect()
    }
    assert got == _ref_paragraph_dedup(docs)
