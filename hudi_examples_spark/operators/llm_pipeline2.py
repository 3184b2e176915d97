"""Second LLM-pipeline battery: embedding-cosine near-dup detection, winnowing
(rolling-window min-hash) document fingerprints, and n-gram/stopword language ID.

Completes the training-data-pipeline surface next to ``llm_pipeline.py``:
- ``dedup_embed_cosine`` — exact ranked near-dup pairs (the oracle baseline);
- ``dedup_embed_ann`` — multi-table LSH candidate generation + exact rescoring,
  the shape that survives 100 TB (bucket equi-join instead of all-pairs);
- ``fp_winnowing`` — MOSS-style winnowing: min gram-hash per sliding window,
  the rolling-hash fingerprinting scheme (Schleimer et al., SIGMOD'03);
- ``lang_detect_ngram`` — deterministic stopword/charset scoring heuristic,
  reported as a (actual, predicted) confusion matrix.

Scale notes are per-operator; none of these collect to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import words
from hudi_examples_spark.functions.vectors import cosine_similarity, lsh_multi_table_buckets
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection
# ---------------------------------------------------------------------------


def dedup_embed_cosine(spark: SparkSession, sf: str, top_k: int = 20, block_size: int = 1024) -> DataFrame:
    """Exact embedding near-dup ranking: top-k most-similar vector pairs via
    blocked BLAS matmuls.

    Scale shape: vectors are hash-assigned to blocks of ~``block_size``; every
    unordered block pair is scored ONCE by a mapInPandas stage that runs one
    numpy (double) matmul per pair and emits only its local top-k (the global
    top-k is a subset of block-pair top-k's); a final TakeOrdered merges. This
    replaces 3 interpreted array-lambda traversals per pair with vectorized
    BLAS — measured 40× faster at sf0.1 — and distributes as independent block
    pairs. Exact all-pairs is inherently O(n²) (the correctness baseline);
    production near-dup at corpus scale goes through ``dedup_embed_ann``.
    """
    import math

    import numpy as np
    import pandas as pd

    e = t(spark, sf, "embeddings").select("vec_id", "embedding")
    n = e.count()  # bounded planning scalar (block-count arithmetic only)
    nblocks = max(1, math.ceil(n / block_size))
    packed = (
        e.withColumn("b", F.pmod(F.xxhash64("vec_id"), F.lit(nblocks)))
        .groupBy("b")
        .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("rows"))
    )
    a = packed.select(F.col("b").alias("b1"), F.col("rows").alias("rows1"))
    bb = packed.select(F.col("b").alias("b2"), F.col("rows").alias("rows2"))
    # Explicit width before the scoring stage (r11): block-pair rows are FEW
    # and FAT (a 1024-vector block ≈ 0.5 MB per side), so AQE coalesces the
    # exchange to ~1 partition by bytes and every BLAS matmul runs in one
    # task — the sf1 scaling pair measured ratio 1.03 across 4× cores. A
    # user repartition on (b1, b2) is AQE-exempt and spreads the O(blocks²)
    # matmuls cluster-wide; partitioning does not affect results (each block
    # pair is scored independently; the global top-k merge is ordered). The
    # width is the block-PAIR count (known driver-side from nblocks), capped
    # at the cluster width — at small sf the exchange stays as narrow as the
    # work (a blanket defaultParallelism width measured +0.26 s at sf0.1 for
    # 3 pairs), at scale it is one task per pair up to every core.
    n_pairs = nblocks * (nblocks + 1) // 2
    width = max(1, min(e.sparkSession.sparkContext.defaultParallelism, n_pairs))
    block_pairs = a.join(bb, F.col("b1") <= F.col("b2"))
    if n_pairs > 4:
        # a near-single-block corpus (≤2 blocks → ≤3 pairs) has nothing to
        # spread; the exchange of its fat rows is pure cost (+0.09 s at
        # sf0.1, A/B'd) — skip it and keep the r10 plan shape exactly
        block_pairs = block_pairs.repartition(width, "b1", "b2")

    out_schema = "d1 BIGINT, d2 BIGINT, cos_sim DOUBLE"

    def score(batches):
        for pdf in batches:
            d1s, d2s, sims = [], [], []
            for rows1, rows2, b1, b2 in zip(pdf["rows1"], pdf["rows2"], pdf["b1"], pdf["b2"]):
                ids1 = np.array([r["vec_id"] for r in rows1], dtype=np.int64)
                ids2 = np.array([r["vec_id"] for r in rows2], dtype=np.int64)
                m1 = np.array([r["embedding"] for r in rows1], dtype=np.float64)
                m2 = np.array([r["embedding"] for r in rows2], dtype=np.float64)
                n1 = np.linalg.norm(m1, axis=1)
                n2 = np.linalg.norm(m2, axis=1)
                n1[n1 == 0] = 1.0
                n2[n2 == 0] = 1.0
                cos = (m1 / n1[:, None]) @ (m2 / n2[:, None]).T
                if b1 == b2:
                    # same block: keep each unordered pair once (id1 < id2)
                    mask = ids1[:, None] < ids2[None, :]
                else:
                    mask = np.ones_like(cos, dtype=bool)
                ii, jj = np.nonzero(mask)
                if not len(ii):
                    continue
                vals = cos[ii, jj]
                lo_all = np.minimum(ids1[ii], ids2[jj])
                hi_all = np.maximum(ids1[ii], ids2[jj])
                # block-pair-local top-k under the FULL output ordering
                # (cos desc, d1, d2) — value-only argsort keeps arbitrary
                # ties, which breaks the "global top-k ⊆ local top-ks"
                # subset property when many pairs share a similarity (e.g.
                # exact duplicates at cos=1.0 — surfaced by the sf1 sweep).
                # O(P) argpartition narrows to the top-k rounded values plus
                # every pair TYING the k-th value (ties must all survive so
                # the (d1,d2) tie-break stays globally correct), then the
                # full lexsort runs only on that small slice — O(P + s log s)
                # instead of O(P log P) over ~block_size² candidates.
                rounded = np.round(vals, 6)
                if len(rounded) > top_k:
                    part = np.argpartition(-rounded, top_k - 1)
                    kth_val = rounded[part[top_k - 1]]
                    cand = np.nonzero(rounded >= kth_val)[0]
                else:
                    cand = np.arange(len(rounded))
                order = np.lexsort((hi_all[cand], lo_all[cand], -rounded[cand]))
                keep = cand[order[:top_k]]
                d1s.extend(lo_all[keep].tolist())
                d2s.extend(hi_all[keep].tolist())
                sims.extend(vals[keep].tolist())
            yield pd.DataFrame({"d1": d1s, "d2": d2s, "cos_sim": sims})

    return (
        block_pairs.mapInPandas(score, out_schema)
        .select("d1", "d2", F.round("cos_sim", 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "d1", "d2")
        .limit(top_k)
    )


DEDUP_EMBED_ORACLE = """
SELECT a.vec_id AS d1, b.vec_id AS d2,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
ORDER BY cos_sim DESC, d1, d2
LIMIT 20
"""


def _lsh_tables(n_tables: int = 8, planes_per_table: int = 4, dim: int = 64, seed: int = 7):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [rng.standard_normal((planes_per_table, dim)).tolist() for _ in range(n_tables)]


_TABLES = _lsh_tables()


def embed_near_dup_pairs(
    e: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tables: list | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: multi-table LSH candidates + exact rescore.

    Each vector gets one bucket id per hash table (array, exploded → |tables|×
    rows); candidates are pairs colliding in ≥1 table (bucket equi-join — a
    shuffle on a bigint key, NOT an all-pairs product); survivors are rescored
    with exact cosine and thresholded. Recall for genuinely-near pairs
    (cos ≥ ~0.9) is ≥99% with 8 tables × 4 planes; verified on planted
    duplicates in tests/test_llm_pipeline2.py.
    """
    tables = tables if tables is not None else _TABLES
    # materialize the banded rows once (r10): both join sides reference this
    # subtree, and Catalyst re-ran the |tables|×|planes| hyperplane dots per
    # side — the checkpoint halves the hash work and the codegen compile of
    # its large literal expression tree
    banded = e.select(
        F.col(id_col).alias("__id"),
        F.col(emb_col).alias("__emb"),
        F.explode(lsh_multi_table_buckets(emb_col, tables)).alias("bucket"),
    ).localCheckpoint(eager=False)
    # Pin the bucket-join width explicitly (r11): the banded side is a
    # localCheckpoint a few MB wide, so AQE coalesces the join exchange to ~1
    # partition — but the join OUTPUT is quadratic in bucket occupancy and
    # now carries the cosine rescore, and AQE sizes by input bytes, not
    # output compute. An explicit repartition(N, bucket) is exempt from AQE
    # coalescing, satisfies the join's hash requirement on both sides (no
    # extra exchange), and spreads the rescore across the cluster. N follows
    # defaultParallelism — scale-adaptive, not a local constant.
    n_part = e.sparkSession.sparkContext.defaultParallelism
    banded = banded.repartition(n_part, "bucket")
    a = banded.select(F.col("__id").alias("d1"), F.col("__emb").alias("emb1"), "bucket")
    b = banded.select(F.col("__id").alias("d2"), F.col("__emb").alias("emb2"), "bucket")
    # Rescore and threshold BEFORE the pair dedup (r11, guide §2.3: shuffle
    # keys and metadata, not payloads): a pair colliding in k tables appears
    # k times, and deduping first shuffled every candidate row with BOTH
    # 64-float embeddings attached (~1 KB/row; measured 1.05M candidate rows
    # for a 2000-vector corpus at sf0.1 — a ~1 GB exchange). Cosine is
    # deterministic per (d1,d2), so computing it map-side after the bucket
    # join and deduping on the 24-byte (d1,d2,cos_sim) rows — post-threshold,
    # which drops non-near pairs before they ever shuffle — is value-identical
    # (dedup keeps an arbitrary row among identical ones; filter-then-dedup ≡
    # dedup-then-filter for a pair-deterministic value). The ~k× extra cosine
    # evaluations are cheap JVM folds; the exchange shrinks by the payload
    # width × the filter selectivity.
    return (
        a.join(b, "bucket")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1", "d2", F.round(cosine_similarity("emb1", "emb2"), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
        .dropDuplicates(["d1", "d2"])
        .orderBy(F.desc("cos_sim"), "d1", "d2")
    )


def dedup_embed_ann(spark: SparkSession, sf: str) -> DataFrame:
    """LSH-bucketed embedding near-dup at threshold 0.4. The hash tables are
    driver-side constants, so the DuckDB oracle embeds the same 8x4 plane
    literals and replays the bucket join + exact rescore in SQL;
    planted-duplicate recall additionally asserted in tests — the sf corpus is
    random, so genuinely-near pairs are scarce by construction."""
    e = t(spark, sf, "embeddings")
    return embed_near_dup_pairs(e, threshold=0.4)


def _embed_ann_oracle() -> str:
    """DuckDB re-expression of embed_near_dup_pairs(_TABLES, threshold=0.4):
    per-table sign-bit buckets (table index shifted into the id), collide-in-
    any-table candidate pairs, exact cosine rescore."""
    selects = []
    for ti, planes in enumerate(_TABLES):
        bits = []
        for i, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
            bits.append(
                f"(CASE WHEN list_inner_product(embedding::DOUBLE[], {lit}) >= 0 "
                f"THEN {1 << i} ELSE 0 END)"
            )
        selects.append(
            "  SELECT vec_id, embedding, ("
            + " + ".join(bits)
            + f" + {ti << 56}::BIGINT)::BIGINT AS bucket FROM embeddings"
        )
    banded = "\n  UNION ALL\n".join(selects)
    return f"""
WITH banded AS (
{banded}
), cand AS (
  SELECT DISTINCT a.vec_id AS d1, b.vec_id AS d2
  FROM banded a JOIN banded b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT c.d1, c.d2,
       round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6) AS cos_sim
FROM cand c
JOIN embeddings e1 ON e1.vec_id = c.d1
JOIN embeddings e2 ON e2.vec_id = c.d2
WHERE round(list_cosine_similarity(e1.embedding::DOUBLE[], e2.embedding::DOUBLE[]), 6) >= 0.4
ORDER BY cos_sim DESC, d1, d2
"""


DEDUP_EMBED_ANN_ORACLE = _embed_ann_oracle()


# ---------------------------------------------------------------------------
# Winnowing (rolling-hash) document fingerprints
# ---------------------------------------------------------------------------


def fp_winnowing(spark: SparkSession, sf: str) -> DataFrame:
    """Winnowing fingerprints: md5 over positional 3-word grams, minimum per
    4-gram sliding window, deduplicated per document (Schleimer et al. MOSS).

    Shape: posexplode grams (order-preserving) → window min keyed on doc_id —
    ONE shuffle on doc_id; window frames are rows-based so the plan is a single
    sort per partition. Docs with <3 words have no grams and are excluded on
    both sides. md5 (not xxhash64) keeps the oracle cross-engine.
    """
    n = max(spark.sparkContext.defaultParallelism, 8)
    d = (
        t(spark, sf, "documents")
        .repartition(n)
        .select("doc_id", words("text").alias("__ws"))
    )
    # guard: sequence(1, 0) is DESCENDING in Spark ([1, 0]) — a 1-2 word doc
    # must produce an empty gram array, not out-of-bounds element_at probes
    idx = F.when(
        F.size("__ws") >= 3, F.sequence(F.lit(1), F.size("__ws") - 2)
    ).otherwise(F.array().cast("array<int>"))
    grams = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                idx,
                lambda i: F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at("__ws", i),
                        F.element_at("__ws", i + 1),
                        F.element_at("__ws", i + 2),
                    )
                ),
            )
        ).alias("pos", "gh"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    fp = grams.select("doc_id", F.min("gh").over(w).alias("fp"))
    return (
        fp.groupBy("doc_id")
        .agg(
            F.count_distinct("fp").alias("n_fingerprints"),
            F.min("fp").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


FP_WINNOWING_ORACLE = """
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS gh
  FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM ws)
), winnowed AS (
  SELECT doc_id,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp
  FROM grams
)
SELECT doc_id, count(DISTINCT fp) AS n_fingerprints, min(fp) AS min_fp
FROM winnowed GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Language identification (n-gram / stopword heuristic)
# ---------------------------------------------------------------------------

#: Per-language marker-token profiles (public high-frequency function words).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist", "nicht"),
    "en": ("the", "and", "of", "is", "it"),
    "es": ("el", "la", "que", "los", "es"),
    "fr": ("le", "les", "et", "est", "une"),
}


def lang_detect_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Heuristic language ID → (actual, predicted) confusion matrix.

    Score = count of profile marker tokens present; CJK characters short-circuit
    to 'zh'; ties resolve in alphabetical language order (deterministic, so the
    DuckDB oracle reproduces it bit-for-bit). One projection + one small
    groupBy — scales as a pure map-side pipeline with a tiny shuffle.
    """
    n = max(spark.sparkContext.defaultParallelism, 8)
    d = (
        t(spark, sf, "documents")
        .repartition(n)
        .select("doc_id", "lang", "text", words("text").alias("__ws"))
    )
    scores = {
        lang: F.size(
            F.filter(
                F.col("__ws"),
                lambda w: F.array_contains(F.array(*[F.lit(m) for m in marks]), F.lower(w)),
            )
        )
        for lang, marks in LANG_PROFILES.items()
    }
    cjk = F.regexp_count("text", F.lit(r"[一-鿿]"))
    best = F.greatest(*scores.values())
    pred = F.when(cjk > 0, F.lit("zh"))
    for lang in sorted(LANG_PROFILES):  # alphabetical tie-break
        pred = pred.when(scores[lang] == best, F.lit(lang))
    return (
        d.select(F.col("lang").alias("actual"), pred.alias("predicted"))
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("actual", "predicted")
    )


LANG_DETECT_ORACLE = """
WITH scored AS (
  SELECT lang AS actual,
         len(list_filter(toks, w -> list_contains(['der','die','und','ist','nicht'], w))) AS s_de,
         len(list_filter(toks, w -> list_contains(['the','and','of','is','it'], w)))      AS s_en,
         len(list_filter(toks, w -> list_contains(['el','la','que','los','es'], w)))      AS s_es,
         len(list_filter(toks, w -> list_contains(['le','les','et','est','une'], w)))     AS s_fr,
         len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) AS cjk
  FROM (SELECT doc_id, lang, text,
               list_transform(list_filter(str_split(trim(text), ' '), w -> w <> ''), w -> lower(w)) AS toks
        FROM documents)
)
SELECT actual,
       CASE WHEN cjk > 0 THEN 'zh'
            WHEN s_de >= greatest(s_de, s_en, s_es, s_fr) THEN 'de'
            WHEN s_en >= greatest(s_de, s_en, s_es, s_fr) THEN 'en'
            WHEN s_es >= greatest(s_de, s_en, s_es, s_fr) THEN 'es'
            ELSE 'fr' END AS predicted,
       count(*) AS n_docs
FROM scored
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# End-to-end training-data pipeline (composition of the pieces above)
# ---------------------------------------------------------------------------


def pipe_training_corpus(spark: SparkSession, sf: str) -> DataFrame:
    """The composed cleaning pipeline a pretraining corpus goes through:
    quality filter (token count + stopword ratio) → exact dedup (min doc_id
    survives) → per-language corpus report. One declarative plan: Catalyst
    fuses the filters into the scan; the dedup is the only shuffle before the
    tiny report aggregation."""
    from hudi_examples_spark.functions.text import quality_ratio_from, token_count, words

    n = max(spark.sparkContext.defaultParallelism, 8)
    d = (
        t(spark, sf, "documents")
        .repartition(n)
        .select("doc_id", "lang", "text", words("text").alias("__ws"))
        .withColumn("n_tokens", token_count("text"))
        .withColumn("stop_ratio", quality_ratio_from(F.col("__ws")))
        .filter((F.col("n_tokens") >= 10) & (F.col("stop_ratio") <= 0.5))
    )
    kept = (
        d.groupBy(F.md5("text").alias("__fp"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("lang").alias("lang"),
            F.min("n_tokens").alias("n_tokens"),
        )
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("lang")
    )


PIPE_CORPUS_ORACLE = """
WITH scored AS (
  SELECT doc_id, lang, text,
         len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
         CASE WHEN len(list_filter(str_split(trim(text), ' '), w -> w <> '')) = 0 THEN 0
              ELSE len(list_filter(str_split(trim(text), ' '),
                       w -> list_contains(['the','a','an','of','and','or','to','in','is','it'], lower(w)))) * 1.0
                   / len(list_filter(str_split(trim(text), ' '), w -> w <> ''))
         END AS stop_ratio
  FROM documents
), kept AS (
  SELECT min(doc_id) AS doc_id, min(lang) AS lang, min(n_tokens) AS n_tokens
  FROM scored
  WHERE n_tokens >= 10 AND stop_ratio <= 0.5
  GROUP BY md5(text)
)
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       round(avg(n_tokens), 4) AS avg_tokens
FROM kept GROUP BY lang ORDER BY lang
"""


SPECS: list[QuerySpec] = [
    QuerySpec("dedup_embed_cosine", dedup_embed_cosine, DEDUP_EMBED_ORACLE, "LLM:dedup-embed"),
    QuerySpec("dedup_embed_ann", dedup_embed_ann, DEDUP_EMBED_ANN_ORACLE, "LLM:dedup-embed"),
    QuerySpec("fp_winnowing", fp_winnowing, FP_WINNOWING_ORACLE, "LLM:fingerprint"),
    QuerySpec("lang_detect_ngram", lang_detect_ngram, LANG_DETECT_ORACLE, "LLM:langid"),
    QuerySpec("pipe_training_corpus", pipe_training_corpus, PIPE_CORPUS_ORACLE, "LLM:pipeline-e2e"),
]
