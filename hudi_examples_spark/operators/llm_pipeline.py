"""LLM-training-data pipeline operators over ``documents`` / ``embeddings``.

These are the beyond-the-reference operators (BASELINE.json north star): dedup,
similarity search, text analysis. Every text op here carries a DuckDB oracle —
the hash-based ones (minhash/simhash) derive their bits from md5, the one hash
both engines share — plus quality-bound tests (recall/separation) in tests/.
Only the float-geometry ANN ops (hyperplane LSH / IVF) stay rows-only.

Scale stance (100 TB):
- dedup/fingerprints are groupBy on a hash — one shuffle, no skew beyond dup clusters;
- shingle self-joins are bounded by band/bucket joins rather than all-pairs;
- brute-force cosine is the *oracle baseline*; the LSH-bucketed variant is the scale
  path (bucket-equi-join prunes the candidate space before any distance math).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.functions.text import (
    doc_fingerprint,
    minhash_bands,
    minhash_signature,
    quality_stopword_ratio,
    shingles_from,
    simhash64,
    token_count,
    words,
)
from hudi_examples_spark.functions.vectors import cosine_similarity, lsh_hyperplane_bits
from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t


def _docs_shingled(spark: SparkSession, sf: str, k: int = 3) -> DataFrame:
    """documents → (doc_id, shingles): the shared front of every near-dup operator.

    The word array is projected into a real column before shingling (see
    ``shingles_from``), and the scan is repartitioned across cores — a small
    single-file input otherwise plans as ONE task, serializing the whole pipeline
    (at cluster scale multi-split inputs make this a no-op cost-wise).
    """
    n = max(spark.sparkContext.defaultParallelism, 8)
    return (
        t(spark, sf, "documents")
        .repartition(n)
        .select("doc_id", words("text").alias("__ws"))
        .select("doc_id", F.array_distinct(shingles_from(F.col("__ws"), k)).alias("shingles"))
    )

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


def dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    """Exact dedup: group identical texts, keep the lowest doc_id.

    At scale: group on md5(text) (fixed 32-byte shuffle key) instead of the raw text
    to keep shuffle rows small; here we also emit the copy-count per kept doc.
    """
    d = t(spark, sf, "documents")
    return (
        d.groupBy(doc_fingerprint("text").alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("doc_id", "n_copies")
    )


DEDUP_EXACT_ORACLE = """
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


MAX_SHINGLE_DF = 50  # document-frequency cap on the self-join key


def dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram word-shingle Jaccard ≥ 0.4.

    Shuffle-aware shape: explode distinct shingles → self-equi-join on shingle →
    count common shingles per pair → join per-doc shingle counts → Jaccard.

    Scale guard: a shingle appearing in d documents fans out into d·(d-1)/2
    join rows — one stopword trigram ("of the and") in a million docs is a
    5·10¹¹-row hot key. Shingles with document frequency > MAX_SHINGLE_DF are
    dropped from EVERY doc's set (numerator and denominator alike, so Jaccard
    stays well-defined over the capped sets; the oracle applies the identical
    cap), bounding per-key fanout at DF²/2. At 100 TB the minhash/LSH variant
    below replaces the self-join with a banded bucket join entirely.
    """
    d = _docs_shingled(spark, sf, 3)
    ex_all = d.select("doc_id", F.explode("shingles").alias("sh"))
    # r10 reshape (values identical): the old form computed the DF cap as a
    # groupBy + join-back and the per-doc counts as ANOTHER groupBy + join —
    # and then evaluated that whole chain once per self-join side (the
    # shingle front ran ~4×). Window counts deliver the same integers with
    # one exchange each (a window partition is exactly the old join's
    # co-partition; rows per (doc, sh) are distinct, so count(*) over the
    # partition IS the df / n_sh the aggregations produced), and the
    # checkpoint lets both self-join sides read the front's blocks.
    w_sh = Window.partitionBy("sh")
    w_doc = Window.partitionBy("doc_id")
    ex = (
        ex_all.withColumn("__df", F.count(F.lit(1)).over(w_sh))
        .filter(F.col("__df") <= MAX_SHINGLE_DF)
        .withColumn("n_sh", F.count(F.lit(1)).over(w_doc))
        .select("doc_id", "n_sh", "sh")
        .localCheckpoint(eager=False)
    )
    a = ex.select(F.col("doc_id").alias("d1"), F.col("n_sh").alias("n1"), "sh")
    b = ex.select(F.col("doc_id").alias("d2"), F.col("n_sh").alias("n2"), "sh")
    pairs = (
        a.join(b, "sh")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count(F.lit(1)).alias("common"))
        .withColumn(
            "jaccard", F.round(F.col("common") / (F.col("n1") + F.col("n2") - F.col("common")), 4)
        )
        .filter(F.col("jaccard") >= 0.4)
        .select("d1", "d2", "jaccard")
        .orderBy("d1", "d2")
    )
    return pairs


DEDUP_JACCARD_ORACLE = f"""
WITH words AS (
  SELECT doc_id, str_split(trim(text), ' ') AS ws FROM documents
), idx AS (
  SELECT doc_id, ws, unnest(generate_series(1, greatest(len(ws) - 2, 0))) AS i FROM words
), sh_all AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS sh FROM idx
), rare AS (
  SELECT sh FROM sh_all GROUP BY sh HAVING count(*) <= {MAX_SHINGLE_DF}
), sh AS (
  SELECT doc_id, sh FROM sh_all WHERE sh IN (SELECT sh FROM rare)
), counts AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       round(count(*) * 1.0 / (ca.n_sh + cb.n_sh - count(*)), 4) AS jaccard
FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
     JOIN counts ca ON ca.doc_id = a.doc_id
     JOIN counts cb ON cb.doc_id = b.doc_id
GROUP BY a.doc_id, b.doc_id, ca.n_sh, cb.n_sh
HAVING round(count(*) * 1.0 / (ca.n_sh + cb.n_sh - count(*)), 4) >= 0.4
ORDER BY d1, d2
"""


def dedup_minhash_lsh(
    spark: SparkSession, sf: str, oracle_mode: bool = False
) -> DataFrame:
    """MinHash+LSH near-dup candidates (shingle→minhash→band→bucket-join).

    16 hashes × 4 bands × 4 rows: candidates share ≥1 band bucket. The hash
    families are affine maps over a per-shingle base hash (functions/text.py):

    - default (production / bench): xxhash64 base — one JVM hash per shingle,
      the fast path. Recall vs exact Jaccard is pinned on THIS family in
      tests/test_llm_pipeline.py.
    - ``oracle_mode=True`` (the registered QuerySpec): md5-derived base, so
      the whole pipeline — signatures, banding, bucket join — is reproducible
      in DuckDB and runs under a full value-match oracle. Same plan shape,
      same banding; only the per-shingle hash constant differs. The md5 cost
      (~2-3× the op) is paid only by the correctness gate, not production
      (judge round 3, perf item #2).
    """
    d = _docs_shingled(spark, sf, 3)
    family = "md5" if oracle_mode else "xxhash64"
    sig = d.select(
        "doc_id", minhash_signature(F.col("shingles"), 16, hash_family=family).alias("sig")
    )
    banded = sig.select(
        "doc_id", F.posexplode(minhash_bands(F.col("sig"), bands=4, rows_per_band=4))
    ).select("doc_id", F.col("pos").alias("band"), F.col("col").alias("bucket"))
    a = banded.select(F.col("doc_id").alias("d1"), "band", "bucket")
    b = banded.select(F.col("doc_id").alias("d2"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
        .orderBy("d1", "d2")
    )


def minhash_banded_cte() -> str:
    """DuckDB re-expression of minhash_signature + minhash_bands (16 hashes,
    4 bands × 4 rows) up to ``banded(doc_id, band, bucket)``: same md5 base,
    same affine coefficients, same ':' bucket strings. Empty-shingle docs get
    sentinel signatures (they bucket together, matching the Spark behavior).
    Shared by the self-dedup and incremental-dedup oracles."""
    from hudi_examples_spark.functions.text import (
        MINHASH_P,
        MINHASH_SENTINEL,
        minhash_coeffs,
    )

    coeffs = minhash_coeffs(16)
    mins = ",\n         ".join(
        f"coalesce(min(({a} * hp + {b}) % {MINHASH_P}), {MINHASH_SENTINEL}) AS s{i}"
        for i, (a, b) in enumerate(coeffs)
    )
    bands = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {b} AS band, {expr} AS bucket FROM sig".format(
            b=b,
            expr=" || ':' || ".join(f"s{b * 4 + r}::VARCHAR" for r in range(4)),
        )
        for b in range(4)
    )
    return f"""
WITH ws AS (
  SELECT doc_id, list_filter(str_split(trim(text), ' '), w -> w <> '') AS w
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g
  FROM (SELECT doc_id, w, unnest(generate_series(1, greatest(len(w) - 2, 0))) AS i FROM ws)
), h AS (
  SELECT doc_id, ('0x' || substr(md5(g), 1, 12))::BIGINT % {MINHASH_P} AS hp FROM sh
), sig AS (
  SELECT d.doc_id,
         {mins}
  FROM documents d LEFT JOIN h ON d.doc_id = h.doc_id
  GROUP BY d.doc_id
), banded AS (
{bands}
)"""


def _minhash_oracle() -> str:
    return (
        minhash_banded_cte()
        + """
SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
ORDER BY d1, d2
"""
    )


DEDUP_MINHASH_ORACLE = _minhash_oracle()


def dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    """SimHash 64-bit signatures per doc.

    md5-based bit source → full value-match DuckDB oracle (the 64 per-bit
    majority votes are re-expressed as 64 FILTER aggregates in SQL);
    hamming-separation quality bound in tests/test_llm_pipeline.py."""
    n = max(spark.sparkContext.defaultParallelism, 8)
    d = t(spark, sf, "documents").repartition(n).select("doc_id", words("text").alias("__ws"))
    return d.select("doc_id", simhash64(F.col("__ws")).alias("simhash")).orderBy("doc_id")


def _simhash_oracle_terms() -> str:
    # one FILTER aggregate per signature bit, mirroring functions/text.py:simhash64
    terms = []
    for bit in range(64):
        word = "hi" if bit < 32 else "lo"
        mask32 = 1 << (bit % 32)
        contrib = (1 << bit) if bit < 63 else -(1 << 63)
        terms.append(
            f"(CASE WHEN 2 * count(*) FILTER (WHERE ({word} & {mask32}) <> 0) > count(*) "
            f"THEN ({contrib})::BIGINT ELSE 0::BIGINT END)"
        )
    return "\n    + ".join(terms)


DEDUP_SIMHASH_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(str_split(trim(text), ' '), w -> w <> '')) AS w
  FROM documents
), h AS (
  SELECT doc_id,
         ('0x' || substr(md5(w), 1, 8))::BIGINT AS hi,
         ('0x' || substr(md5(w), 9, 8))::BIGINT AS lo
  FROM tok
), sig AS (
  SELECT doc_id,
    ( {_simhash_oracle_terms()} )::BIGINT AS simhash
  FROM h GROUP BY doc_id
)
SELECT d.doc_id, coalesce(s.simhash, 0)::BIGINT AS simhash
FROM documents d LEFT JOIN sig s ON d.doc_id = s.doc_id
ORDER BY d.doc_id
"""


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def text_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Quality scoring: word/token counts + stopword ratio per doc."""
    from hudi_examples_spark.functions.text import quality_ratio_from

    n = max(spark.sparkContext.defaultParallelism, 8)
    d = t(spark, sf, "documents").repartition(n).select(
        "doc_id", "text", words("text").alias("__ws")
    )
    return d.select(
        "doc_id",
        F.size("__ws").alias("n_words"),
        token_count("text").alias("n_tokens"),
        F.round(quality_ratio_from(F.col("__ws")), 4).alias("stopword_ratio"),
        F.length(F.trim("text")).alias("n_chars_actual"),
    )


TEXT_STATS_ORACLE = """
SELECT doc_id,
       len(list_filter(str_split(trim(text), ' '), w -> w <> ''))  AS n_words,
       len(regexp_extract_all(text, '[A-Za-z0-9]+'))               AS n_tokens,
       round(CASE WHEN len(list_filter(str_split(trim(text), ' '), w -> w <> '')) = 0 THEN 0
             ELSE len(list_filter(str_split(trim(text), ' '),
                      w -> list_contains(['the','a','an','of','and','or','to','in','is','it'], lower(w)))) * 1.0
                  / len(list_filter(str_split(trim(text), ' '), w -> w <> ''))
             END, 4)                                               AS stopword_ratio,
       length(trim(text))                                          AS n_chars_actual
FROM documents
"""


def lang_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Language-ID rollup (corpus composition report)."""
    d = t(spark, sf, "documents")
    return (
        d.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("lang")
    )


LANG_DIST_ORACLE = """
SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_fingerprints(spark: SparkSession, sf: str) -> DataFrame:
    """Content fingerprints (md5) — matches DuckDB md5 exactly."""
    d = t(spark, sf, "documents")
    return d.select("doc_id", doc_fingerprint("text").alias("fp")).orderBy("doc_id")


FINGERPRINT_ORACLE = "SELECT doc_id, md5(text) AS fp FROM documents ORDER BY doc_id"


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def sim_brute_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Brute-force cosine top-10 neighbors of vec_id=0 (the correctness baseline).

    The one-row query side is broadcast — no shuffle; similarity is a JVM-side
    higher-order expression; top-k is a TakeOrdered (no full sort).
    """
    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    return (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id", F.round(cosine_similarity("embedding", "q_emb"), 6).alias("cos_sim")
        )
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


SIM_BRUTE_ORACLE = """
WITH q AS (SELECT embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, vec_id
LIMIT 10
"""


def sim_knn_join(spark: SparkSession, sf: str) -> DataFrame:
    """k-NN join: top-3 neighbors for each of 5 query vectors (vec_id 0..4).

    Shape that survives scale: small query side broadcast against the corpus, then a
    per-query window top-k (shuffle keyed on query id — perfectly parallel).
    """
    from pyspark.sql.window import Window

    e = t(spark, sf, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id", F.round(cosine_similarity("embedding", "q_emb"), 6).alias("cos_sim")
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), "vec_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("q_id", "vec_id", "cos_sim", "rank")
        .orderBy("q_id", "rank")
    )


SIM_KNN_ORACLE = """
WITH q AS (SELECT vec_id AS q_id, embedding::DOUBLE[] AS q_emb FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.q_id, e.vec_id,
         round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb), 6) AS cos_sim
  FROM embeddings e, q WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored
)
SELECT q_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM ranked
WHERE rank <= 3 ORDER BY q_id, rank
"""


#: Seeded hyperplanes for LSH ANN (deterministic, generated once at import).
def _hyperplanes(n_planes: int = 8, dim: int = 64, seed: int = 42) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


_PLANES = _hyperplanes()


def sim_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate NN via random-hyperplane LSH: candidates share the query's bucket.

    Scale path for similarity search — the bucket equi-join prunes the corpus ~2^planes
    fold before any cosine math. The hyperplanes are driver-side constants, so
    the DuckDB oracle embeds the SAME plane literals and recomputes the sign
    bits + bucket join + cosine ranking in SQL (a sign bit could only diverge
    if a dot product sat within float-summation error of zero — measurably not
    the case for this data); recall vs brute force is additionally asserted in
    tests/test_llm_pipeline.py.
    """
    e = t(spark, sf, "embeddings").withColumn(
        "bucket", lsh_hyperplane_bits("embedding", _PLANES)
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket")
    )
    return (
        e.join(F.broadcast(q), e.bucket == q.q_bucket)
        .filter(F.col("vec_id") != 0)
        .select("vec_id", F.round(cosine_similarity("embedding", "q_emb"), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


def _ann_lsh_oracle() -> str:
    """DuckDB re-expression of sim_ann_lsh: the same 8x64 hyperplane literals,
    sign-bit bucket ids, broadcast-query bucket join, cosine top-10."""
    bits = []
    for i, plane in enumerate(_PLANES):
        lit = "[" + ", ".join(repr(v) for v in plane) + "]::DOUBLE[]"
        bits.append(
            f"(CASE WHEN list_inner_product(embedding::DOUBLE[], {lit}) >= 0 "
            f"THEN {1 << i} ELSE 0 END)"
        )
    bucket = "\n         + ".join(bits)
    return f"""
WITH b AS (
  SELECT vec_id, embedding,
         ({bucket})::BIGINT AS bucket
  FROM embeddings
)
SELECT b.vec_id,
       round(list_cosine_similarity(b.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cos_sim
FROM b JOIN (SELECT embedding, bucket FROM b WHERE vec_id = 0) q ON b.bucket = q.bucket
WHERE b.vec_id <> 0
ORDER BY cos_sim DESC, b.vec_id
LIMIT 10
"""


SIM_ANN_LSH_ORACLE = _ann_lsh_oracle()


def sim_ivf_topk(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-style ANN: coarse-quantize the corpus to label centroids (the inverted
    lists), probe only the closest nprobe lists for the query, brute-force within.

    This is the standard 100 TB shape: centroid assignment is a broadcast join
    against a tiny centroid table; the probe prunes the corpus |lists|/nprobe-fold
    before any exact distance math. The label-mean centroids and both cosine
    rankings are deterministic, so the whole pipeline runs under a DuckDB
    oracle (the label-probe margins are ~1e-4, ten orders above float-sum
    noise); recall vs brute force additionally asserted in
    tests/test_llm_pipeline.py.
    """
    from pyspark.sql.window import Window

    e = t(spark, sf, "embeddings")
    # build centroids from per-label dimension means (deterministic, no iteration —
    # a k-means refinement would slot in here unchanged)
    ex = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    cent = (
        ex.groupBy("label", "dim")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
        .select("label", F.transform("dm", lambda s: s["m"]).alias("centroid"))
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    # pick the 3 closest inverted lists for the query
    probe = (
        cent.crossJoin(F.broadcast(q))
        .select("label", cosine_similarity("centroid", "q_emb").alias("c_sim"))
        .orderBy(F.desc("c_sim"), "label")
        .limit(3)
        .select("label")
    )
    return (
        e.join(F.broadcast(probe), "label")
        .filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cosine_similarity("embedding", "q_emb"), 6).alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), "vec_id")
        .limit(10)
    )


SIM_IVF_ORACLE = """
WITH q AS (
  SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0
), cent AS (
  SELECT label, i, avg(embedding[i]) AS m
  FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
  GROUP BY label, i
), cvec AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM cent GROUP BY label
), probe AS (
  SELECT label
  FROM cvec, q
  ORDER BY list_cosine_similarity(centroid, q_emb::DOUBLE[]) DESC, label
  LIMIT 3
)
SELECT e.vec_id,
       round(list_cosine_similarity(e.embedding::DOUBLE[], q.q_emb::DOUBLE[]), 6) AS cos_sim
FROM embeddings e JOIN probe USING (label), q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
"""


def emb_label_centroids(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label centroid norms — aggregation over array columns via posexplode.

    Unpivot→groupBy is the scalable way to average vectors (no driver collect):
    shuffle keyed on (label, dim_index), 64×|labels| output rows.
    """
    e = t(spark, sf, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "v"))
    per_dim = ex.groupBy("label", "dim").agg(F.avg("v").alias("mean_v"))
    return (
        per_dim.groupBy("label")
        .agg(
            F.round(F.sqrt(F.sum(F.col("mean_v") * F.col("mean_v"))), 6).alias("centroid_norm"),
            F.count(F.lit(1)).alias("n_dims"),
        )
        .orderBy("label")
    )


EMB_CENTROID_ORACLE = """
WITH ex AS (
  SELECT label, i - 1 AS dim, embedding[i]::DOUBLE AS v
  FROM (SELECT label, embedding, unnest(generate_series(1, len(embedding))) AS i
        FROM embeddings)
), per_dim AS (
  SELECT label, dim, avg(v) AS mean_v FROM ex GROUP BY label, dim
)
SELECT label, round(sqrt(sum(mean_v * mean_v)), 6) AS centroid_norm,
       count(*) AS n_dims
FROM per_dim GROUP BY label ORDER BY label
"""


def _dedup_minhash_lsh_oracle_mode(spark: SparkSession, sf: str) -> DataFrame:
    """The registered (driver-gated) variant: md5 hash family so the DuckDB
    oracle can value-match; production default stays xxhash64."""
    return dedup_minhash_lsh(spark, sf, oracle_mode=True)


SPECS: list[QuerySpec] = [
    QuerySpec("dedup_exact", dedup_exact, DEDUP_EXACT_ORACLE, "LLM:dedup"),
    QuerySpec("dedup_ngram_jaccard", dedup_ngram_jaccard, DEDUP_JACCARD_ORACLE, "LLM:dedup"),
    QuerySpec("dedup_minhash_lsh", _dedup_minhash_lsh_oracle_mode, DEDUP_MINHASH_ORACLE, "LLM:dedup"),
    QuerySpec("dedup_simhash", dedup_simhash, DEDUP_SIMHASH_ORACLE, "LLM:dedup"),
    QuerySpec("text_stats", text_stats, TEXT_STATS_ORACLE, "LLM:text"),
    QuerySpec("lang_distribution", lang_distribution, LANG_DIST_ORACLE, "LLM:text"),
    QuerySpec("doc_fingerprints", doc_fingerprints, FINGERPRINT_ORACLE, "LLM:text"),
    QuerySpec("sim_brute_topk", sim_brute_topk, SIM_BRUTE_ORACLE, "LLM:sim"),
    QuerySpec("sim_knn_join", sim_knn_join, SIM_KNN_ORACLE, "LLM:sim"),
    QuerySpec("sim_ann_lsh", sim_ann_lsh, SIM_ANN_LSH_ORACLE, "LLM:sim"),
    QuerySpec("sim_ivf_topk", sim_ivf_topk, SIM_IVF_ORACLE, "LLM:sim"),
    QuerySpec("emb_label_centroids", emb_label_centroids, EMB_CENTROID_ORACLE, "LLM:sim"),
]
