"""Fourth LLM-pipeline battery: corpus curation ops a pretraining pipeline runs
between "raw crawl" and "training mixture".

- ``pipe_pii_redact`` — multi-pattern PII scrubbing (emails, SSNs, phone
  numbers, IPv4s) with per-doc redaction counts. The sf ``documents`` corpus is
  synthetic word soup with no PII, so each doc gets a deterministic PII
  suffix derived from ``doc_id`` FIRST (identically in the DuckDB oracle), and
  the scrubber must then remove exactly those plants — a self-checking fixture.
- ``pipe_stratified_sample`` — deterministic per-language downsampling by
  content-independent hash bucket (rerunning the pipeline yields the same
  sample; no ``rand()`` so the oracle can agree bit-for-bit).
- ``pipe_dataset_mixture`` — two-phase weighted mixture: per-source token
  totals → proportional-to-weight token budget → per-source keep rate →
  hash-bucket sampling. The planning aggregate is tiny (one row per source)
  and broadcast back; the sample itself is a per-row filter.
- ``text_tfidf_topterms`` — classic TF-IDF keyword extraction, top-3 terms
  per document with deterministic tie-breaks.
- ``pipe_doc_chunks`` — overlapping sliding-window chunking (window 32
  tokens, stride 24): the RAG/packing primitive that splits long documents
  into model-sized pieces, each doc expanding independently (no shuffle).

Scale stance: every op here is a per-row projection/filter or a single
aggregation keyed by a low-cardinality column (source/lang); the only joins
broadcast one-row-per-source planning tables. Nothing collects to the driver.

Reference parity note: the reference has no corpus ops at all (its surface is
table DML — see SURVEY.md §2); this module is part of the "beyond-reference
training-data pipeline" mandate, styled after the reference's differential
test discipline (``TestAutomationUtils.scala:57-83``): every op's exact
semantics are pinned by a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from hudi_examples_spark.operators.spec import QuerySpec
from hudi_examples_spark.sources.readers import load_sf_table as t

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

#: RE2-compatible (DuckDB) AND java.util.regex-compatible (Spark) patterns —
#: no backreferences or lookaround, ASCII \b semantics agree in both engines.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _planted_text() -> F.Column:
    """text + deterministic PII suffix (email, phone, IPv4, SSN) from doc_id."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return F.concat(
        F.col("text"),
        F.lit(" Contact user"), s(d),
        F.lit("@mail"), s(d % 10), F.lit(".com or call 555-"),
        F.lpad(s(d % 1000), 3, "0"), F.lit("-"), F.lpad(s(d % 10000), 4, "0"),
        F.lit(" from 10."), s(d % 256), F.lit(".0."), s((d * 7) % 256),
        F.lit(" ssn 123-45-"), F.lpad(s(d % 10000), 4, "0"),
    )


def redact_pii(col: F.Column) -> F.Column:
    """Scrub PII in a fixed pattern order (email → SSN → phone → IPv4).

    Order matters and is part of the contract: SSNs are redacted before the
    phone pattern so ``123-45-6789`` can never be half-eaten by the looser
    phone shape, and emails go first so their numeric domains can't be read
    as IPs. Pure JVM-side regexp_replace chain — no Python in the row path.
    """
    out = F.regexp_replace(col, PII_EMAIL, "<EMAIL>")
    out = F.regexp_replace(out, PII_SSN, "<SSN>")
    out = F.regexp_replace(out, PII_PHONE, "<PHONE>")
    return F.regexp_replace(out, PII_IP, "<IP>")


def count_pii(col: F.Column) -> F.Column:
    """Total PII matches across the four pattern classes (pre-redaction)."""
    return (
        F.regexp_count(col, F.lit(PII_EMAIL))
        + F.regexp_count(col, F.lit(PII_SSN))
        + F.regexp_count(col, F.lit(PII_PHONE))
        + F.regexp_count(col, F.lit(PII_IP))
    ).cast("bigint")


def pipe_pii_redact(spark: SparkSession, sf: str) -> DataFrame:
    """Plant deterministic PII per doc, then scrub it; return the clean text
    and the per-doc redaction count. Per-row projection only — no shuffle."""
    d = t(spark, sf, "documents")
    planted = _planted_text()
    return (
        d.select("doc_id", planted.alias("planted"))
        .select(
            "doc_id",
            redact_pii(F.col("planted")).alias("clean_text"),
            count_pii(F.col("planted")).alias("n_pii"),
        )
        .orderBy("doc_id")
    )


# The oracle builds the identical planted text, applies the identical
# pattern chain ('g' = global, matching Spark's replace-all default).
_ORACLE_PLANTED = """
  text || ' Contact user' || CAST(doc_id AS VARCHAR)
       || '@mail' || CAST(doc_id % 10 AS VARCHAR) || '.com or call 555-'
       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
       || ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.'
       || CAST((doc_id * 7) % 256 AS VARCHAR)
       || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
"""

PII_REDACT_ORACLE = f"""
WITH planted AS (
  SELECT doc_id, {_ORACLE_PLANTED} AS p FROM documents
)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(regexp_replace(p,
         '{PII_EMAIL}', '<EMAIL>', 'g'),
         '{PII_SSN}', '<SSN>', 'g'),
         '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_IP}', '<IP>', 'g') AS clean_text,
       CAST(len(regexp_extract_all(p, '{PII_EMAIL}'))
          + len(regexp_extract_all(p, '{PII_SSN}'))
          + len(regexp_extract_all(p, '{PII_PHONE}'))
          + len(regexp_extract_all(p, '{PII_IP}')) AS BIGINT) AS n_pii
FROM planted
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Deterministic stratified sampling
# ---------------------------------------------------------------------------

#: Per-language keep rates (percent): downsample the over-represented head
#: language hard, keep the tail languages nearly whole.
STRATA_RATES = {"en": 25, "zh": 80, "de": 80, "es": 80, "fr": 80}


def hash_bucket(key: F.Column, buckets: int, salt: str = "") -> F.Column:
    """Engine-portable uniform bucket in [0, buckets): first 8 md5 hex chars.

    Identical in DuckDB as ``('0x' || substr(md5(key || salt), 1, 8))::BIGINT
    % buckets`` — used instead of xxhash64 so oracles can re-derive the exact
    sample. 32 hash bits >> bucket counts used here, so bias is negligible.
    """
    h = F.md5(F.concat(key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % buckets


def pipe_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic downsample: keep doc iff its hash bucket
    falls under the language's rate. Pure filter — zero shuffles, and the
    same doc set survives any re-run / corpus reorder (hash of doc_id, not
    position). 100 TB shape: embarrassingly parallel scan."""
    d = t(spark, sf, "documents")
    rate = F.coalesce(
        *[F.when(F.col("lang") == k, F.lit(v)) for k, v in STRATA_RATES.items()],
        F.lit(50),
    )
    return (
        d.withColumn("bucket", hash_bucket(F.col("doc_id"), 100, salt="strat"))
        .where(F.col("bucket") < rate)
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )


_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in STRATA_RATES.items()
) + " ELSE 50 END"

STRATIFIED_ORACLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'strat'), 1, 8))::BIGINT % 100
      < {_RATE_SQL}
ORDER BY doc_id
"""

# ---------------------------------------------------------------------------
# Weighted dataset mixture
# ---------------------------------------------------------------------------

#: Mixture weights: favored sources get 4x the token budget share of the rest.
MIX_FAVORED = ("src0", "src1", "src2", "src3")
MIX_W_HI, MIX_W_LO = 2.0, 0.5
MIX_BUDGET_FRAC = 0.5  # total mixture budget = 50% of corpus tokens


def _token_count_col() -> F.Column:
    """Whitespace token count via length arithmetic (regex-free, so the
    DuckDB oracle is trivially identical)."""
    return (
        F.length("text") - F.length(F.regexp_replace(F.col("text"), " ", "")) + 1
    ).cast("bigint")


def pipe_dataset_mixture(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase weighted mixture sampling.

    Phase 1 (planning): per-source token totals ``t_src`` → one row per
    source; the global budget ``MIX_BUDGET_FRAC * Σtokens`` is split across
    sources proportional to weight; ``rate = min(1, share / t_src)``.
    Phase 2 (sampling): broadcast the tiny rate table back onto the corpus
    and keep rows whose hash bucket falls under the rate.

    At 100 TB phase 1 is one partial-aggregated shuffle to ~#sources rows and
    phase 2 is a broadcast-joined scan — no full-table shuffle anywhere.
    Returns the per-source audit (docs/tokens kept) rather than the sampled
    rows so the result is sf-stable and tiny.
    """
    d = t(spark, sf, "documents").withColumn("tokens", _token_count_col())
    w = F.when(F.col("source").isin(*MIX_FAVORED), F.lit(MIX_W_HI)).otherwise(
        F.lit(MIX_W_LO)
    )
    per_src = d.groupBy("source").agg(F.sum("tokens").alias("t_src")).withColumn("w", w)
    totals = per_src.agg(
        F.sum("t_src").alias("t_total"), F.sum("w").alias("w_total")
    )
    rates = per_src.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(MIX_BUDGET_FRAC)
            * F.col("t_total")
            * F.col("w")
            / F.col("w_total")
            / F.col("t_src"),
        ).alias("rate"),
    )
    kept = (
        d.withColumn("bucket", hash_bucket(F.col("doc_id"), 1_000_000, salt="mix"))
        .join(F.broadcast(rates), "source")
        .where(F.col("bucket").cast("double") / 1_000_000.0 < F.col("rate"))
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("n_tokens"),
        )
        .orderBy("source")
    )


MIXTURE_ORACLE = f"""
WITH d AS (
  SELECT *, CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) + 1
                 AS BIGINT) AS tokens
  FROM documents
),
per_src AS (
  SELECT source, sum(tokens) AS t_src,
         CASE WHEN source IN {MIX_FAVORED} THEN {MIX_W_HI} ELSE {MIX_W_LO} END AS w
  FROM d GROUP BY source
),
totals AS (SELECT sum(t_src) AS t_total, sum(w) AS w_total FROM per_src),
rates AS (
  SELECT source,
         least(1.0, {MIX_BUDGET_FRAC} * t_total * w / w_total / t_src) AS rate
  FROM per_src, totals
),
kept AS (
  SELECT d.source, d.tokens
  FROM d JOIN rates USING (source)
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'mix'), 1, 8))::BIGINT
             % 1000000 AS DOUBLE) / 1000000.0 < rate
)
SELECT source, count(*) AS n_docs, CAST(sum(tokens) AS BIGINT) AS n_tokens
FROM kept GROUP BY source ORDER BY source
"""

# ---------------------------------------------------------------------------
# TF-IDF top terms
# ---------------------------------------------------------------------------


def text_tfidf_topterms(spark: SparkSession, sf: str, k: int = 3) -> DataFrame:
    """Top-k TF-IDF terms per document (deterministic tie-break on term).

    Shape: one explode + two keyed aggregations (doc_id×term, then term) and
    a per-doc window top-k. The document-frequency table is one row per
    distinct term — broadcast back. idf = ln((N+1)/(df+1)); both engines
    compute it from identical integers, so scores agree bit-for-bit and the
    (score DESC, term ASC) ranking is stable across engines.
    """
    d = t(spark, sf, "documents")
    terms = d.select(
        "doc_id",
        F.explode(F.filter(F.split(F.col("text"), " "), lambda w: w != "")).alias(
            "term"
        ),
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(win))
        .where(F.col("rk") <= k)
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round("score", 6).alias("tfidf"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("doc_id", "rk")
    )


TFIDF_ORACLE = """
WITH terms AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM terms WHERE term <> '' GROUP BY doc_id, term
),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)) AS score
  FROM tf JOIN df USING (term), n
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tf, df, round(score, 6) AS tfidf, CAST(rk AS INT) AS rk
FROM ranked WHERE rk <= 3
ORDER BY doc_id, rk
"""

# ---------------------------------------------------------------------------
# Sliding-window document chunking
# ---------------------------------------------------------------------------

CHUNK_W, CHUNK_S = 32, 24  # window / stride in tokens (overlap = 8)


def pipe_doc_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Split each doc into overlapping token windows (W=32, stride=24).

    chunk i covers tokens [i*S+1, i*S+W]; the last window is the first one
    whose end reaches the doc end (short docs → exactly one chunk). Each row
    expands independently via explode — no shuffle, linear in corpus size,
    and chunk counts are O(tokens/stride) so output stays bounded.
    """
    d = t(spark, sf, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda w: w != "")
    base = d.select("doc_id", ws.alias("ws")).select(
        "doc_id",
        "ws",
        F.size("ws").alias("n"),
    )
    n_chunks = F.when(F.col("n") <= CHUNK_W, F.lit(1)).otherwise(
        F.ceil((F.col("n") - CHUNK_W) / float(CHUNK_S)).cast("bigint") + 1
    )
    chunks = base.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - 1))
    )
    start = F.col("chunk_id") * CHUNK_S + 1
    length = F.least(F.lit(CHUNK_W), F.col("n") - start + 1)
    piece = F.slice(F.col("ws"), start, length)
    return chunks.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    ).orderBy("doc_id", "chunk_id")


CHUNKS_ORACLE = f"""
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
  FROM documents
),
counted AS (
  SELECT doc_id, ws, n,
         CASE WHEN n <= {CHUNK_W} THEN 1
              ELSE CAST(ceil((n - {CHUNK_W}) / {CHUNK_S}.0) AS BIGINT) + 1 END AS n_chunks
  FROM base
),
chunks AS (
  SELECT doc_id, ws, n,
         unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM counted
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(len(ws[chunk_id * {CHUNK_S} + 1 :
                 least(chunk_id * {CHUNK_S} + {CHUNK_W}, n)]) AS BIGINT) AS n_tokens,
       array_to_string(ws[chunk_id * {CHUNK_S} + 1 :
                          least(chunk_id * {CHUNK_S} + {CHUNK_W}, n)], ' ') AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_id
"""


SPECS: list[QuerySpec] = [
    QuerySpec("pipe_pii_redact", pipe_pii_redact, PII_REDACT_ORACLE, "LLM:pii"),
    QuerySpec(
        "pipe_stratified_sample", pipe_stratified_sample, STRATIFIED_ORACLE, "LLM:sample"
    ),
    QuerySpec("pipe_dataset_mixture", pipe_dataset_mixture, MIXTURE_ORACLE, "LLM:mixture"),
    QuerySpec("text_tfidf_topterms", text_tfidf_topterms, TFIDF_ORACLE, "LLM:tfidf"),
    QuerySpec("pipe_doc_chunks", pipe_doc_chunks, CHUNKS_ORACLE, "LLM:chunking"),
]
