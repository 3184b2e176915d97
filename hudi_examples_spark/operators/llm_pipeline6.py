"""Sixth LLM-pipeline battery: unigram-LM quality scoring and curriculum
ordering — the two corpus-preparation steps between "scored corpus" and
"training order".

- ``text_unigram_lm_score`` — CCNet-shape model-based filtering: score each
  document by how typical its tokens are of the corpus (documents full of
  common words score high, gibberish/rare-token documents score low). The
  canonical form averages unigram log-probabilities (perplexity filtering);
  this implementation keeps the exact-integer analogue — per-token corpus
  frequency plus add-one smoothing — so the driver gate hashes exact BIGINTs
  instead of boundary-roundable logs. Same ranking direction, same pipeline
  role.
- ``pipe_curriculum_order`` — quality-curriculum training order: all ``high``
  band documents first, then ``mid``, then ``low``, seeded-shuffled within
  each band (md5 hash order, no RNG) — deterministic, resumable, and
  expressible in any engine.

Scale notes per-op; nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import shingles_from, words
from hudi_examples_spark.functions.vectors import cosine_similarity
from hudi_examples_spark.operators.llm_pipeline5 import (
    _docs,
    quality_sql,
    with_quality_columns,
)
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

#: vocabulary cap: at corpus scale the frequency table must stay broadcastable,
#: so only the TOP_V most frequent tokens carry their own count (deterministic
#: cut: count desc, token asc); everything else is OOV with add-one smoothing.
#: At test scale the vocabulary is far below the cap, so the cut never bites.
TOP_V = 65536

CURRICULUM_SEED = "cur42"


def text_unigram_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Unigram corpus-frequency score per document.

    Shape: one token-count aggregation (map-side combined shuffle on the
    token), the TOP_V vocabulary broadcast back onto the token stream (no
    second fact shuffle), then a per-doc aggregation — at 100 TB the
    frequency table is the only global state and it is capped and broadcast,
    exactly how distributed LM-filtering pipelines ship their unigram tables.
    Output is exact integer math: ``score_num = Σ (count(w) + 1)`` over the
    doc's tokens (OOV → 1) and ``avg_freq_milli = (1000·score_num) DIV
    n_tokens``. Documents with no tokens are excluded on both sides."""
    d = _docs(spark, sf).select("doc_id", words("text").alias("__ws"))
    toks = d.select("doc_id", F.explode("__ws").alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(TOP_V)
    )
    scored = toks.join(F.broadcast(vocab), "w", "left")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce(F.col("c"), F.lit(0)) + 1).alias("score_num"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.col("score_num").cast("long").alias("score_num"),
            F.expr("(1000 * score_num) DIV n_tokens").alias("avg_freq_milli"),
        )
        .orderBy("doc_id")
    )


TEXT_UNIGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(str_split(trim(text), ' '), w -> w <> '')) AS w
  FROM documents
), vocab AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w ORDER BY c DESC, w ASC LIMIT {TOP_V}
), scored AS (
  SELECT t.doc_id, coalesce(v.c, 0) + 1 AS s
  FROM toks t LEFT JOIN vocab v USING (w)
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       sum(s)::BIGINT AS score_num,
       ((1000 * sum(s)) // count(*))::BIGINT AS avg_freq_milli
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


def pipe_curriculum_order(spark: SparkSession, sf: str) -> DataFrame:
    """Quality-curriculum training order: high band → mid → low, seeded
    md5-shuffle within each band.

    Shape: one window per band key (3 partitions — band_rank), a 3-row count
    table joined back for the band offsets, giving every document a global
    ``curriculum_pos`` WITHOUT a global sort: position = band offset +
    within-band rank. The within-band window keys on only 3 values, so at
    100 TB this would salt the band key into (band, shard) and emit per-shard
    files the way pipe_shuffle_order does; the band offsets stay a 3-row
    broadcast either way."""
    q = with_quality_columns(_docs(spark, sf).select("doc_id", "text")).select(
        "doc_id", "band"
    )
    band_idx = (
        F.when(F.col("band") == "high", F.lit(0))
        .when(F.col("band") == "mid", F.lit(1))
        .otherwise(F.lit(2))
    )
    h = F.md5(F.concat(F.lit(CURRICULUM_SEED + ":"), F.col("doc_id").cast("string")))
    d = q.select("doc_id", "band", band_idx.alias("bi"), h.alias("h"))
    w = Window.partitionBy("bi").orderBy("h", "doc_id")
    ranked = d.withColumn("band_rank", F.row_number().over(w))
    counts = ranked.groupBy("bi").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "bi",
        (
            F.sum("n").over(
                Window.orderBy("bi").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("off"),
    ).select("bi", F.coalesce("off", F.lit(0)).alias("off"))
    return (
        ranked.join(F.broadcast(offsets), "bi")
        .select(
            "doc_id",
            "band",
            F.col("band_rank").cast("long").alias("band_rank"),
            (F.col("off") + F.col("band_rank")).cast("long").alias("curriculum_pos"),
        )
        .orderBy("curriculum_pos")
    )


PIPE_CURRICULUM_ORACLE = f"""
WITH q AS (
  {quality_sql("doc_id")}
), d AS (
  SELECT doc_id, band,
         CASE band WHEN 'high' THEN 0 WHEN 'mid' THEN 1 ELSE 2 END AS bi,
         md5('{CURRICULUM_SEED}:' || CAST(doc_id AS VARCHAR)) AS h
  FROM q
), ranked AS (
  SELECT doc_id, band, bi,
         row_number() OVER (PARTITION BY bi ORDER BY h, doc_id) AS band_rank
  FROM d
), offs AS (
  SELECT bi, coalesce(sum(n) OVER (ORDER BY bi
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM (SELECT bi, count(*) AS n FROM ranked GROUP BY bi)
)
SELECT r.doc_id, r.band,
       r.band_rank::BIGINT AS band_rank,
       (o.off + r.band_rank)::BIGINT AS curriculum_pos
FROM ranked r JOIN offs o USING (bi)
ORDER BY curriculum_pos
"""


def corpus_report(spark: SparkSession, sf: str) -> DataFrame:
    """Per-(lang, source) corpus summary — the dataset-card report: document
    counts, token totals, char-length min/max/median/mean. One map-side-
    combined groupBy over low-cardinality keys; the median uses the exact
    interpolated percentile at 0.5 (midpoint of two integers — exactly
    representable, so it hashes identically cross-engine; higher quantiles
    would interpolate at non-dyadic fractions and belong to the sketch
    profile instead)."""
    d = _docs(spark, sf).select(
        "lang", "source", "n_chars", F.size(words("text")).alias("n_toks")
    )
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.expr("percentile(n_chars, 0.5)").alias("p50_chars"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


CORPUS_REPORT_ORACLE = """
WITH d AS (
  SELECT lang, source, n_chars,
         len(list_filter(str_split(trim(text), ' '), w -> w <> '')) AS n_toks
  FROM documents
)
SELECT lang, source,
       count(*) AS n_docs,
       sum(n_toks)::BIGINT AS total_tokens,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       quantile_cont(n_chars, 0.5) AS p50_chars,
       round(avg(n_chars), 2) AS avg_chars
FROM d GROUP BY lang, source ORDER BY lang, source
"""


def semantic_dup_pairs(
    e: DataFrame,
    threshold: float,
    max_cluster_size: int = 96,
    block_size: int = 1024,
) -> DataFrame:
    """Within-cluster exact near-dup pairs (d1 < d2, rounded cosine ≥
    threshold), with clusters routed by size between two EXACT physical
    plans that produce identical output.

    Clusters at or under ``max_cluster_size`` take the plain cluster-keyed
    self-join (one hash shuffle on the cluster id). Larger clusters are
    RE-CHUNKED by the block-pair pattern of ``dedup_embed_cosine``: members
    hash into ~``block_size`` sub-blocks, every unordered sub-block pair is
    scored once by a vectorized BLAS matmul in an independent task, and ALL
    pairs over the threshold are emitted (no top-k — this is exact dedup, so
    results are identical to the naive join; only the physical chunking
    changes). Per-task work is bounded at ~block_size² comparisons
    regardless of cluster size, which kills the SemDeDup giant-cluster skew
    failure mode.

    Why the cutover sits at ~100 members rather than "only guard the
    skewed": the join path evaluates cosine through ``zip_with``/
    ``aggregate`` HIGHER-ORDER functions, which Spark executes interpreted
    (they never enter whole-stage codegen) — measured ~30 µs per 64-dim
    pair, so a 200-member cluster's 20k pairs already cost more than one
    Arrow batch + BLAS matmul. Above ~100 members BLAS wins outright; below
    it, pair counts (<5k) are too small to repay the mapInPandas batch
    overhead."""
    import math

    import numpy as np
    import pandas as pd

    # cluster cardinality is tiny (k clusters): one small count agg, and only
    # the OVERSIZED labels come to the driver (usually none). When no cluster
    # breaches the cap the plan below is bit-identical to the unguarded
    # cluster-keyed self-join — the guard costs one count job, nothing else.
    big = {
        r["label"]: r["count"]
        for r in e.groupBy("label")
        .count()
        .filter(F.col("count") > max_cluster_size)
        .collect()
    }

    small = e.filter(~F.col("label").isin(list(big))) if big else e
    a = small.select("label", F.col("vec_id").alias("d1"), F.col("embedding").alias("emb1"))
    b = small.select("label", F.col("vec_id").alias("d2"), F.col("embedding").alias("emb2"))
    dups = (
        a.join(b, "label")
        .filter(F.col("d1") < F.col("d2"))
        .select(
            "d1", "d2", F.round(cosine_similarity("emb1", "emb2"), 6).alias("cos_sim")
        )
        .filter(F.col("cos_sim") >= threshold)
    )
    if big:
        nb = {lab: max(2, math.ceil(cnt / block_size)) for lab, cnt in big.items()}
        nb_df = F.create_map(*[F.lit(x) for kv in nb.items() for x in kv])
        packed = (
            e.filter(F.col("label").isin(list(big)))
            .withColumn("sb", F.pmod(F.xxhash64("vec_id"), nb_df[F.col("label")]))
            .groupBy("label", "sb")
            .agg(F.collect_list(F.struct("vec_id", "embedding")).alias("rows"))
        )
        pa = packed.select("label", F.col("sb").alias("sb1"), F.col("rows").alias("rows1"))
        pb = packed.select("label", F.col("sb").alias("sb2"), F.col("rows").alias("rows2"))
        # explicit AQE-exempt width before the BLAS stage: few fat block rows
        # coalesce to ~1 partition by bytes while the matmul work is
        # O(blocks²) — same fix as dedup_embed_cosine (r11); partitioning
        # does not affect results (block pairs score independently). Width =
        # total block-pair count (known driver-side from the nb dict), capped
        # at the cluster width, so a small corpus pays no extra exchange width.
        n_pairs = sum(k * (k + 1) // 2 for k in nb.values())
        width = max(1, min(e.sparkSession.sparkContext.defaultParallelism, n_pairs))
        block_pairs = pa.join(pb, "label").filter(F.col("sb1") <= F.col("sb2"))
        if n_pairs > 4:
            # same tiny-corpus gate as dedup_embed_cosine: nothing to spread
            # below a handful of pairs, so skip the fat-row exchange
            block_pairs = block_pairs.repartition(width, "label", "sb1", "sb2")

        def score(batches):
            for pdf in batches:
                d1s, d2s, sims = [], [], []
                for rows1, rows2, sb1, sb2 in zip(
                    pdf["rows1"], pdf["rows2"], pdf["sb1"], pdf["sb2"]
                ):
                    ids1 = np.array([r["vec_id"] for r in rows1], dtype=np.int64)
                    ids2 = np.array([r["vec_id"] for r in rows2], dtype=np.int64)
                    m1 = np.array([r["embedding"] for r in rows1], dtype=np.float64)
                    m2 = np.array([r["embedding"] for r in rows2], dtype=np.float64)
                    n1 = np.linalg.norm(m1, axis=1)
                    n2 = np.linalg.norm(m2, axis=1)
                    n1[n1 == 0] = 1.0
                    n2[n2 == 0] = 1.0
                    cos = (m1 / n1[:, None]) @ (m2 / n2[:, None]).T
                    if sb1 == sb2:
                        mask = ids1[:, None] < ids2[None, :]
                    else:
                        mask = np.ones_like(cos, dtype=bool)
                    # loose pre-filter on the RAW cosine (1e-6 slack); the
                    # exact HALF_UP round + threshold happens Spark-side so
                    # boundary verdicts match the Catalyst small-cluster path
                    # bit-for-bit (np.round is half-even — not the same).
                    ii, jj = np.nonzero(mask & (cos >= threshold - 1e-6))
                    if not len(ii):
                        continue
                    lo = np.minimum(ids1[ii], ids2[jj])
                    hi = np.maximum(ids1[ii], ids2[jj])
                    d1s.extend(lo.tolist())
                    d2s.extend(hi.tolist())
                    sims.extend(cos[ii, jj].tolist())
                yield pd.DataFrame({"d1": d1s, "d2": d2s, "cos_sim": sims})

        dups = dups.unionByName(
            block_pairs.mapInPandas(score, "d1 BIGINT, d2 BIGINT, cos_sim DOUBLE")
            .select("d1", "d2", F.round("cos_sim", 6).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold)
        )
    return dups


def dedup_semantic(spark: SparkSession, sf: str, threshold: float = 0.92) -> DataFrame:
    """SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): pairwise cosine is computed only WITHIN a cluster —
    here the embeddings' ``label`` column plays the k-means assignment — and
    of every near-dup pair the lower ``vec_id`` is kept. Emits one row per
    vector with its keep/drop verdict and how many same-cluster near-dups it
    has, so the driver hash certifies the full verdict set.

    Scale shape: the self-join key is the cluster id, so the pair space is
    O(Σ c_i²) ≈ O(n²/k) instead of O(n²) — the whole point of SemDeDup — and
    the skewed-giant-cluster failure mode is mechanically guarded:
    ``semantic_dup_pairs`` re-chunks any cluster past ``max_cluster_size``
    through the blocked BLAS pair pattern, keeping per-task pair counts
    bounded (verified in tests/test_llm_pipeline6.py with a planted
    majority cluster). No driver collects beyond the tiny cluster-size map;
    exact cosine, rounded identically to the DuckDB oracle before the
    threshold test.
    """
    e = t(spark, sf, "embeddings")
    # materialized once: the near-dup pair set (tiny — pairs over threshold)
    # feeds three branches (both sides of the count union + the drop set);
    # without the checkpoint Catalyst re-runs the whole cluster self-join +
    # blocked-BLAS mapInPandas per branch (plans/r10/dedup_semantic_before
    # .txt: 26 parquet scans, 6 python nodes)
    dups = semantic_dup_pairs(e, threshold).localCheckpoint()
    dup_counts = (
        dups.select(F.col("d1").alias("vec_id"))
        .unionAll(dups.select(F.col("d2").alias("vec_id")))
        .groupBy("vec_id")
        .agg(F.count("*").alias("n_near_dups"))
    )
    dropped = dups.select(F.col("d2").alias("vec_id")).distinct().withColumn("__drop", F.lit(True))
    return (
        e.select("vec_id", "label")
        .join(dup_counts, "vec_id", "left")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "label",
            F.coalesce("n_near_dups", F.lit(0)).alias("n_near_dups"),
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("kept"),
        )
        .orderBy("vec_id")
    )


DEDUP_SEMANTIC_ORACLE = """
WITH dups AS (
  SELECT a.vec_id AS d1, b.vec_id AS d2
  FROM embeddings a JOIN embeddings b
    ON a.label = b.label AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.92
)
SELECT e.vec_id, e.label,
       (SELECT count(*) FROM dups d WHERE d.d1 = e.vec_id OR d.d2 = e.vec_id) AS n_near_dups,
       e.vec_id NOT IN (SELECT d2 FROM dups) AS kept
FROM embeddings e
ORDER BY e.vec_id
"""


BLOOM_REF_MOD = 10  # reference corpus = doc_id % 10 == 0 (the "already-trained" set)
BLOOM_SHINGLE_K = 5  # 5-gram membership — the decontamination granularity
BLOOM_FPP = 1e-6  # prefilter FP budget: ~0.01 expected FPs per 10k probes


def dedup_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-prefiltered cross-corpus decontamination (the Dolma bloom-dedupe
    shape, on the Hudi bloom-index machinery): flag source documents sharing
    any 5-gram with a REFERENCE corpus, carrying the reference membership as
    a BLOOM FILTER instead of a raw join side.

    Why this exists next to ``pipe_decontaminate`` (broadcast shingle join):
    at web scale the reference side is billions of shingles — too big to
    broadcast raw and a full shuffle to join per run. A bloom is ~29 bits
    per key at 1e-6 FPP (~3.6 MB per million shingles): each partition
    builds a PARTIAL filter at one agreed (m, k) shape in a single numpy
    pass (``mapInPandas``), the driver ORs the tiny blobs — bits travel,
    never shingles — and the merged filter broadcasts back for a vectorized
    membership probe over the source corpus. Bloom positives are CANDIDATES
    (false positives possible, deterministic under the fixed hash family);
    an exact shingle semi-join over ONLY the candidates confirms — the
    expensive join's left side shrinks from |corpus| to |candidates|, which
    is the entire point. The bloom is a pruning layer, never a truth layer —
    the same contract as the table layer's key blooms.

    Emitted ``bloom_pruned_ok`` certifies under the driver hash that the
    candidate set was a strict subset of the source docs."""
    import pandas as pd

    from hudi_examples_spark.table.bloom import (
        bloom_contains,
        bloom_params,
        build_bloom_fixed,
        merge_blooms,
    )

    d = _docs(spark, sf).select("doc_id", words(F.col("text")).alias("w"))
    sh = d.select(
        "doc_id", F.explode(shingles_from(F.col("w"), BLOOM_SHINGLE_K)).alias("g")
    )
    ref = sh.filter(F.col("doc_id") % BLOOM_REF_MOD == 0)
    src = sh.filter(F.col("doc_id") % BLOOM_REF_MOD != 0)

    # 1. shape the filter from the (over-counted, duplicate-tolerant)
    #    reference shingle count — one agg job, no distinct shuffle
    n_ref = ref.count()
    m, k = bloom_params(max(n_ref, 1), BLOOM_FPP)

    # 2. partial blooms per Arrow batch, OR-merged driver-side
    def _partials(batches):
        for pdf in batches:
            if len(pdf):
                yield pd.DataFrame(
                    [build_bloom_fixed(pdf["g"].tolist(), m, k)],
                    columns=["m", "k", "n", "bits"],
                )

    parts = ref.select("g").mapInPandas(
        _partials, "m LONG, k LONG, n LONG, bits STRING"
    ).collect()
    bloom = merge_blooms([r.asDict() for r in parts])
    b_bloom = spark.sparkContext.broadcast(bloom)

    # 3. vectorized candidate probe over the source shingles
    def _probe(batches):
        for pdf in batches:
            if len(pdf):
                yield pdf[bloom_contains(b_bloom.value, pdf["g"].tolist())]

    cand_sh = src.mapInPandas(_probe, "doc_id LONG, g STRING")
    # 4. exact confirm on candidates only (AQE picks the join strategy)
    confirmed = (
        cand_sh.join(ref.select("g").distinct(), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    n_src_docs = d.filter(F.col("doc_id") % BLOOM_REF_MOD != 0).count()
    n_cand_docs = cand_sh.select("doc_id").distinct().count()
    pruned_ok = n_cand_docs < n_src_docs
    return (
        d.filter(F.col("doc_id") % BLOOM_REF_MOD != 0)
        .select("doc_id")
        .join(confirmed.withColumn("__hit", F.lit(True)), "doc_id", "left_outer")
        .select(
            "doc_id",
            F.coalesce("__hit", F.lit(False)).alias("contaminated"),
            F.lit(pruned_ok).alias("bloom_pruned_ok"),
        )
        .orderBy("doc_id")
    )


DEDUP_BLOOM_PREFILTER_ORACLE = f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), sh AS (
  SELECT doc_id, array_to_string(w[i:i+{BLOOM_SHINGLE_K - 1}], ' ') AS g
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - {BLOOM_SHINGLE_K - 1}, 0))) AS i
        FROM ws)
), ref AS (
  SELECT DISTINCT g FROM sh WHERE doc_id % {BLOOM_REF_MOD} = 0
), hits AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN ref USING (g)
  WHERE s.doc_id % {BLOOM_REF_MOD} <> 0
)
SELECT d.doc_id,
       h.doc_id IS NOT NULL AS contaminated,
       TRUE AS bloom_pruned_ok
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % {BLOOM_REF_MOD} <> 0
ORDER BY d.doc_id
"""


SPECS: list[QuerySpec] = [
    QuerySpec(
        "text_unigram_lm_score", text_unigram_lm_score, TEXT_UNIGRAM_ORACLE, "LLM:quality-lm"
    ),
    QuerySpec(
        "pipe_curriculum_order", pipe_curriculum_order, PIPE_CURRICULUM_ORACLE, "LLM:ordering"
    ),
    QuerySpec("corpus_report", corpus_report, CORPUS_REPORT_ORACLE, "LLM:reporting"),
    QuerySpec("dedup_semantic", dedup_semantic, DEDUP_SEMANTIC_ORACLE, "LLM:dedup SemDeDup cluster-scoped"),
    QuerySpec(
        "dedup_bloom_prefilter",
        dedup_bloom_prefilter,
        DEDUP_BLOOM_PREFILTER_ORACLE,
        "LLM:dedup bloom-prefiltered cross-corpus decontamination",
    ),
]
