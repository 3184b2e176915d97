"""Vector math over ``array<float>`` embedding columns — pure Column expressions.

Design for scale: these compile to Catalyst higher-order functions (``zip_with`` /
``aggregate``) that run inside the JVM per-row with no Python round-trip and no UDF
serialization; they vectorize fine across 100 TB because they are ordinary projections.
A Pandas-UDF path would only win if we batched into BLAS matmuls — that variant lives in
the ANN operator (`operators/llm_pipeline.py`) where the batch shape justifies it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two float-array columns, accumulated in double."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """Euclidean norm of a float-array column."""
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def l2_sq(a: Column | str, b: Column | str) -> Column:
    """Squared euclidean distance of two float-array columns, in double —
    left-to-right accumulation, the order the PQ oracle mirrors."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs rather than NaN.

    Three primitive folds, everything bound once (r11). History: the pre-r10
    naive ``when(l2(a)*l2(b)==0, 0).otherwise(dot(a,b)/(l2(a)*l2(b)))``
    evaluated FIVE folds per row (two norms twice); r10 fused them into ONE
    fold accumulating a (Σxy, Σx², Σy²) struct — but that allocates a 3-field
    struct per array element in the ``zip_with`` plus a struct accumulator per
    fold step, and the r10 PERF artifact caught it ~40% SLOWER on the
    brute-force cross-join shape (sim_knn_join 0.65→1.05 s). The r11 A/B
    (tools/ab_cosine.py) shows three SEPARATE primitive folds — no struct
    allocation anywhere — win on every consumer shape: knn cross-join
    1.09→0.86 s, 1-query brute 0.47→0.36 s, pair rescore 1.27→0.69 s vs the
    fused form at sf0.1. The double-cast inputs bind once through a 1-element
    ``transform(array(struct(x, y)))``, and the three fold results bind once
    the same way, so no subtree is evaluated twice. Value-identical to both
    prior forms: each accumulator folds left-to-right over the same elements
    in the same order, and the scalar combination is the same
    ``sqrt(Σx²)·sqrt(Σy²)`` test and quotient."""

    def combine(x: Column, y: Column) -> Column:
        d = F.aggregate(
            F.zip_with(x, y, lambda u, v: u * v), F.lit(0.0), lambda acc, u: acc + u
        )
        na = F.aggregate(x, F.lit(0.0), lambda acc, u: acc + u * u)
        nb = F.aggregate(y, F.lit(0.0), lambda acc, u: acc + u * u)
        return F.transform(
            F.array(F.struct(d.alias("d"), na.alias("na"), nb.alias("nb"))),
            lambda s: F.when(
                F.sqrt(s["na"]) * F.sqrt(s["nb"]) == 0.0, F.lit(0.0)
            ).otherwise(s["d"] / (F.sqrt(s["na"]) * F.sqrt(s["nb"]))),
        )[0]

    return F.transform(
        F.array(F.struct(_as_double(a).alias("x"), _as_double(b).alias("y"))),
        lambda s: combine(s["x"], s["y"]),
    )[0]


def _planes_sql(planes: list[list[float]]) -> str:
    """``array(array(...))`` SQL text for a plane matrix. ``repr(float)``
    round-trips IEEE doubles exactly and Spark's lexer parses the ``D``
    suffix (incl. e-notation and -0.0) to the bit-identical double —
    unit-checked in tests."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in p) + ")" for p in planes
        )
        + ")"
    )


def _bit_weights_lit(n: int) -> Column:
    """``array(1L, 2L, 4L, ...)`` — the per-plane bit weights, little-endian."""
    return F.expr("array(" + ",".join(f"{1 << i}L" for i in range(n)) + ")")


def _bucket_from(base: Column, planes_col: Column, weights_col: Column) -> Column:
    """Sign-bit bucket of ``base`` against a plane matrix COLUMN.

    Value-identical to the r10 unrolled form: each plane's dot is the same
    left-to-right ``zip_with``+fold, and the bit-weight sum is integer
    addition (exact in any order; the zip preserves plane order anyway).
    The win is plan size — the unrolled form inlined |planes| separate
    fold trees over |dim| ``F.lit`` calls each (~15k py4j round-trips and
    a ~2.6 s plan-construction cost per dedup_embed_ann invocation, r11
    profile); this form is a fixed ~30-node tree over two array literals
    parsed from ONE SQL string each (guide §7.3: very large expression
    trees make planning itself the bottleneck)."""
    dots = F.transform(
        planes_col,
        lambda p: F.aggregate(
            F.zip_with(base, p, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    zero = F.lit(0).cast("bigint")
    return F.aggregate(
        F.zip_with(dots, weights_col, lambda d, w: F.when(d >= 0, w).otherwise(zero)),
        zero,
        lambda acc, x: acc + x,
    )


def lsh_multi_table_buckets(
    a: Column | str, tables: list[list[list[float]]]
) -> Column:
    """Multi-table hyperplane LSH: one bucket id per hash table, as an
    ``array<bigint>``. Near-dup candidates collide in ≥1 table — multiple
    independent tables trade a constant-factor more shuffle rows (|tables|× on
    explode) for exponentially better recall at a fixed per-table selectivity,
    the standard ANN construction. Table index is baked into the bucket id so a
    single (bucket) equi-join key suffices downstream."""
    for planes in tables:
        if len(planes) > 63:
            raise ValueError("at most 63 hyperplanes (bits of a signed 64-bit bucket id)")
    # bind the double-cast input ONCE for all tables' plane dots (r10: the
    # per-plane ``dot`` re-ran the cast transform — |tables|×|planes| times)
    def buckets_from(base: Column) -> Column:
        if len({len(t) for t in tables}) == 1:
            # uniform plane count: ONE 3-D literal + an index-aware transform
            tables3d = F.expr(
                "array(" + ",".join(_planes_sql(t) for t in tables) + ")"
            )
            w = _bit_weights_lit(len(tables[0]))
            shift = F.lit(1 << 56).cast("bigint")
            return F.transform(
                tables3d,
                # disjoint bucket spaces per table: shift in the table index
                lambda planes, ti: _bucket_from(base, planes, w)
                + ti.cast("bigint") * shift,
            )
        return F.array(
            *[
                _bucket_from(base, F.expr(_planes_sql(planes)), _bit_weights_lit(len(planes)))
                + F.lit(ti << 56).cast("bigint")
                for ti, planes in enumerate(tables)
            ]
        )

    return F.transform(
        F.array(F.struct(_as_double(a).alias("e"))), lambda s: buckets_from(s["e"])
    )[0]


def lsh_hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of dot product),
    packed into a BIGINT bucket id. ``planes`` must be driver-side constants
    (seeded, ≤ 63 planes) so the expression is a pure literal tree — executors
    evaluate it with no shuffle and no Python.
    """
    return _hyperplane_bits_precast(_as_double(a), planes)


def _hyperplane_bits_precast(base: Column, planes: list[list[float]]) -> Column:
    """``lsh_hyperplane_bits`` over an ALREADY double-cast array expression —
    callers that evaluate many plane dots bind the cast once (r10)."""
    if len(planes) > 63:
        raise ValueError("at most 63 hyperplanes (bits of a signed 64-bit bucket id)")
    return _bucket_from(base, F.expr(_planes_sql(planes)), _bit_weights_lit(len(planes)))
