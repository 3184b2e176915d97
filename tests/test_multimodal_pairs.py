"""Paired image-text curation (round 9): planted aligned/misaligned pairs
through the alignment gate and the per-source retention report."""

from __future__ import annotations

import glob
import hashlib
import shutil


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, source)."""
    full = [(r[0], r[1], "en", r[2], len(r[1])) for r in rows]
    df = spark.createDataFrame(
        full, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "docs"))
    shutil.copy(
        glob.glob(str(tmp_path / "docs" / "*.parquet"))[0],
        str(tmp_path / "documents.parquet"),
    )
    return str(tmp_path)


def _is_swapped(doc_id: int) -> bool:
    """Replicates the md5 planting rule in multimodal_pairs._pairs."""
    from hudi_examples_spark.operators.multimodal_pairs import _CAP_MISMATCH_MOD

    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return h % _CAP_MISMATCH_MOD == 0


def test_caption_align_planted_pairs(spark, tmp_path):
    from hudi_examples_spark.operators.multimodal_pairs import (
        _CAP_SHIFT,
        _MIN_AGREE,
        mm_caption_align,
    )

    n = 12
    texts = [
        f"document {i} body " + " ".join(f"tok{i}_{j}" for j in range(6 + i))
        for i in range(n)
    ]
    sf = _write_docs(
        spark, tmp_path, [(i, texts[i], f"s{i % 3}") for i in range(n)]
    )
    rows = {r["media_id"]: r for r in mm_caption_align(spark, sf).collect()}
    assert set(rows) == set(range(n))
    swapped = {i for i in range(n) if _is_swapped(i)}
    assert swapped, "planting selected no docs — pick a larger n"
    for i in range(n):
        r = rows[i]
        if i in swapped:
            assert r["cap_id"] == (i + _CAP_SHIFT) % n and r["mismatched"]
            # distinct texts: coordinate agreement is a ~1/997 coincidence
            assert r["n_agree"] < _MIN_AGREE and not r["aligned"]
        else:
            # payload bytes == caption utf-8 bytes → all 16 coords agree
            assert r["cap_id"] == i and not r["mismatched"]
            assert r["n_agree"] == 16 and r["aligned"]
            assert r["n_img_bytes"] == r["n_cap_bytes"] == len(texts[i])


def test_pair_curation_retention_report(spark, tmp_path):
    from hudi_examples_spark.operators.multimodal_pairs import mm_pair_curation

    n = 12
    texts = [f"body {i} " + " ".join(f"w{i}_{j}" for j in range(8)) for i in range(n)]
    sf = _write_docs(
        spark, tmp_path, [(i, texts[i], f"s{i % 3}") for i in range(n)]
    )
    rep = {r["source"]: r for r in mm_pair_curation(spark, sf).collect()}
    assert set(rep) == {"s0", "s1", "s2"}
    for src, r in rep.items():
        ids = [i for i in range(n) if f"s{i % 3}" == src]
        kept = [i for i in ids if not _is_swapped(i)]
        assert r["n_pairs"] == len(ids)
        assert r["n_kept"] == len(kept)
        assert r["retention_pct"] == 100 * len(kept) // len(ids)


def test_pair_keep_best_recrawl_reconciliation(spark, tmp_path):
    # Full differential against an independent numpy replica of the aHash +
    # shared-projection math: structurally similar planted texts are ALLOWED
    # to share a phash (that is what a perceptual hash does), so expected
    # groups/winners are computed, not assumed.
    import numpy as np

    from hudi_examples_spark.operators.multimodal_pairs import (
        _CAP_SHIFT,
        _MIN_AGREE,
        _MOD,
        _RECRAWL_SHIFT,
        _RESIDUES,
        _W,
        mm_pair_keep_best,
    )

    n = 12
    texts = [f"img {i} alt " + " ".join(f"t{i}_{j}" for j in range(7)) for i in range(n)]
    sf = _write_docs(
        spark, tmp_path, [(i, texts[i], f"s{i % 3}") for i in range(n)]
    )

    def ahash(b: bytes) -> str:
        a = np.frombuffer(b, np.uint8).astype(np.int64)
        blk = (np.arange(len(a)) * 64) // len(a)
        bsum = np.bincount(blk, weights=a, minlength=64).astype(np.int64)
        blen = np.bincount(blk, minlength=64).astype(np.int64)
        bits = (bsum * len(a)) > (int(a.sum()) * blen)
        return "".join(
            f"{int(sum(1 << (15 - k) for k in range(16) if bits[16 * q + k])):04x}"
            for q in range(4)
        )

    def proj(b: bytes) -> list[int]:
        a = np.frombuffer(b, np.uint8).astype(np.int64)
        s = np.bincount(
            np.arange(len(a)) % _RESIDUES, weights=a, minlength=_RESIDUES
        ).astype(np.int64)
        return ((s @ np.array(_W, dtype=np.int64)) % _MOD).tolist()

    u = {i: proj(texts[i].encode()) for i in range(n)}
    groups: dict[str, list[tuple]] = {}
    for i in range(n):
        sw = _is_swapped(i)
        cap_a = (i + _CAP_SHIFT) % n if sw else i
        cap_b = i if sw else (i + _RECRAWL_SHIFT) % n
        ph = ahash(texts[i].encode())
        for mid, cap, crawl in ((i, cap_a, "a"), (i + n, cap_b, "b")):
            agree = sum(int(x == y) for x, y in zip(u[i], u[cap]))
            groups.setdefault(ph, []).append((agree, -mid, mid, cap, crawl))
    expected = {}
    for ph, members in groups.items():
        agree, _neg, mid, cap, crawl = max(members)
        expected[ph] = (len(members), mid, cap, crawl, agree, agree >= _MIN_AGREE)

    rows = mm_pair_keep_best(spark, sf).collect()
    got = {
        r["phash"]: (
            r["n_members"],
            r["winner_media_id"],
            r["winner_cap_id"],
            r["winner_crawl"],
            r["winner_agree"],
            r["winner_aligned"],
        )
        for r in rows
    }
    assert got == expected
    # every group holds at least one aligned copy (crawl B flips A's
    # planting), so every winner is a rescued, aligned pair
    assert all(v[5] and v[4] == 16 for v in got.values())
