"""Text-analysis Column builders: tokenization, shingles, fingerprints, quality,
minhash/simhash signatures. All JVM-side expressions (split/transform/aggregate/
xxhash64) — no Python UDFs, so they scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny default stopword list (public, language-agnostic enough for scoring).
STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")


def words(text: Column | str) -> Column:
    """Whitespace word tokens of trimmed text (drops empty tokens)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.trim(c), "\\s+"), lambda w: w != "")


def token_count(text: Column | str, pattern: str = "[A-Za-z0-9]+") -> Column:
    """BPE-ish token count: number of alphanumeric runs (regexp-based)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(c, F.lit(pattern))


def quality_ratio_from(ws: Column) -> Column:
    """Stopword fraction from a materialized word array (see ``shingles_from`` note)."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, F.lower(w))))
    return F.when(F.size(ws) == 0, F.lit(0.0)).otherwise(n_stop / F.size(ws))


def quality_stopword_ratio(text: Column | str) -> Column:
    """Fraction of tokens that are stopwords — cheap quality signal."""
    return quality_ratio_from(words(text))


def doc_fingerprint(text: Column | str) -> Column:
    """Deterministic content fingerprint (md5 hex) for exact-dup detection."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def shingles_from(ws: Column, k: int = 3) -> Column:
    """k-word shingles from an already-materialized word array.

    Callers should project the word array into a real column first (one split per
    row); inlining ``words(text)`` here makes Catalyst re-evaluate the split for
    every ``element_at`` inside the lambda — O(words²) per row, measured 10x slower.
    """
    idx = F.sequence(F.lit(1), F.greatest(F.size(ws) - (k - 1), F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(ws, i + j) for j in range(k)])
    )


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Array of k-word shingles (space-joined), order-preserving with duplicates."""
    return shingles_from(words(text), k)


#: MinHash universe: affine hash families over a 31-bit Mersenne prime, on a
#: 48-bit md5-derived base value. Everything here is reproducible in any
#: engine with md5 — which is what lets the minhash+LSH dedup run under a
#: full value-match DuckDB oracle instead of a rows-only check.
MINHASH_P = (1 << 31) - 1
#: sentinel minimum for empty shingle sets (no 3-gram → no signature info)
MINHASH_SENTINEL = 2**63 - 1


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) per hash family: Knuth-multiplicative spread,
    a ≠ 0 mod P. Shared by the Spark expressions and the oracle SQL."""
    out = []
    for i in range(num_hashes):
        a = (i * 2654435761 + 2654435761) % MINHASH_P or 1
        b = (i * 40503 + 7) % MINHASH_P
        out.append((a, b))
    return out


def minhash_base(shingle: Column, hash_family: str = "xxhash64") -> Column:
    """Integer base hash of a shingle, reduced mod P. Positive, overflow-safe
    (a·h < 2^62 for the affine maps layered on top).

    Two families, identical plan shape:

    - ``"xxhash64"`` (default, production): one JVM xxhash64 call per shingle
      — the fast path. Spark-only, so not oracle-reproducible.
    - ``"md5"`` (oracle mode): first 12 hex chars of md5 — ~an order of
      magnitude costlier per shingle, but reproducible in any engine with
      md5, which is what lets the driver's DuckDB oracle value-match the
      whole minhash/LSH pipeline.
    """
    if hash_family == "xxhash64":
        return F.pmod(F.xxhash64(shingle), F.lit(MINHASH_P))
    if hash_family != "md5":
        raise ValueError(f"unknown minhash hash_family: {hash_family!r}")
    return F.conv(F.substring(F.md5(shingle), 1, 12), 16, 10).cast("bigint") % F.lit(MINHASH_P)


def minhash_signature(
    shingles: Column, num_hashes: int = 32, hash_family: str = "xxhash64"
) -> Column:
    """MinHash signature: array of ``num_hashes`` minima per shingle, folded
    with elementwise min in a single pass over the shingle array. Empty
    shingle sets get sentinel minima.

    Hash families (same plan shape, different per-shingle hash):

    - ``"xxhash64"`` (default, production): N independent SEEDED hashes
      ``xxhash64(i, shingle)`` — the standard N-families-by-seeding trick,
      all JVM-side. Measured ~1.6× faster end-to-end than routing the
      affine family over one base hash (16 multiply-mods per shingle cost
      more than 15 extra xxhash64 calls on short strings — profiled at
      sf0.1, round 5).
    - ``"md5"`` (oracle mode): affine maps ``(a_i·h + b_i) mod P`` over a
      48-bit md5-derived base — reproducible in any engine with md5, which
      is what lets the DuckDB oracle value-match the whole pipeline.

    Shapes differ per family because interpreted higher-order lambdas have
    NO common-subexpression elimination (r10, guide §1.2/§4):

    - xxhash64: the elementwise-min fold — each of the N hashes is an
      independent seeded call, nothing is shared, the fold is optimal.
    - md5: the fold form re-evaluated the md5-base expression once PER
      AFFINE REFERENCE — 16 md5+conv per shingle, measured 5× the whole
      signature's cost at sf0.1. Instead the base array is computed once
      (one md5 per shingle) and BOUND as a lambda variable (the 1-element
      ``transform(array(bases), ...)`` trick — a lambda variable is
      evaluated once, where a repeated column expression is not), and each
      hash takes ``array_min`` of its affine map over the bound array.
      Value-identical (exactness + both edge shapes pinned in
      test_text_functions)."""
    sentinel = F.lit(MINHASH_SENTINEL).cast("bigint")
    if hash_family == "xxhash64":
        init = F.array_repeat(sentinel, num_hashes)

        def hashes(s):
            return F.array(*[F.xxhash64(F.lit(i), s) for i in range(num_hashes)])

        return F.aggregate(
            shingles,
            init,
            lambda acc, s: F.zip_with(acc, hashes(s), lambda a, b: F.least(a, b)),
        )
    coeffs = minhash_coeffs(num_hashes)
    p = F.lit(MINHASH_P)
    bases = F.transform(shingles, lambda s: minhash_base(s, hash_family))

    def sig_of(bs):
        return F.array(
            *[
                F.coalesce(
                    F.array_min(F.transform(bs, lambda h: (F.lit(a) * h + F.lit(b)) % p)),
                    sentinel,
                )
                for a, b in coeffs
            ]
        )

    return F.when(
        shingles.isNull(), F.lit(None).cast("array<bigint>")
    ).otherwise(F.element_at(F.transform(F.array(bases), sig_of), 1))


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: array of ``bands`` bucket ids, each the ':'-joined string
    of ``rows_per_band`` consecutive signature entries. Candidate pairs share
    ≥1 band bucket. String buckets (not a second hash) keep the banding
    reproducible across engines for the oracle."""
    out = []
    for b in range(bands):
        parts = [
            F.element_at(signature, b * rows_per_band + r + 1).cast("string")
            for r in range(rows_per_band)
        ]
        out.append(F.concat_ws(":", *parts))
    return F.array(*out)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash over a token array: per-bit majority vote of token hashes.

    The per-token hash is the md5 digest split into two 32-bit words (hi = hex
    chars 1-8, lo = chars 9-16) — 64 hash bits reproducible in ANY engine with
    md5, which is what lets the driver run a full value-match DuckDB oracle
    (xxhash64, the previous bit source, is Spark-only and forced a rows-only
    check). Returns BIGINT.

    The (hi, lo, n) triple is computed ONCE and bound as a lambda variable
    before the 64 per-bit votes read it (r10, same class as the
    ``minhash_signature`` md5 fix): interpreted higher-order lambdas have no
    common-subexpression elimination, so the previous form — ``hi``/``lo``
    as plain column expressions referenced by every vote — re-ran the whole
    md5+conv token pass once per bit, 64× the hashing work. Bit-exact
    (pinned against the unbound form in test_llm_pipeline)."""
    hx = F.transform(tokens, lambda w: F.md5(w))
    hi = F.transform(hx, lambda h: F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"))
    lo = F.transform(hx, lambda h: F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint"))

    def votes(s):
        acc = F.lit(0).cast("bigint")
        n = s["n"]
        for bit in range(64):
            word = s["hi"] if bit < 32 else s["lo"]
            mask32 = F.lit(1 << (bit % 32)).cast("bigint")
            contrib = (
                F.lit(1 << bit).cast("bigint")
                if bit < 63
                else F.lit(-(1 << 63)).cast("bigint")
            )
            ones = F.size(F.filter(word, lambda h: h.bitwiseAND(mask32) != 0))
            acc = acc + F.when(ones * 2 > n, contrib).otherwise(F.lit(0).cast("bigint"))
        return acc

    bound = F.struct(
        hi.alias("hi"), lo.alias("lo"), F.size(tokens).cast("bigint").alias("n")
    )
    return F.element_at(F.transform(F.array(bound), votes), 1)
