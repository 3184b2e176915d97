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
    """Cosine similarity; 0.0 for zero-norm inputs rather than NaN."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def lsh_multi_table_buckets(
    a: Column | str, tables: list[list[list[float]]]
) -> Column:
    """Multi-table hyperplane LSH: one bucket id per hash table, as an
    ``array<bigint>``. Near-dup candidates collide in ≥1 table — multiple
    independent tables trade a constant-factor more shuffle rows (|tables|× on
    explode) for exponentially better recall at a fixed per-table selectivity,
    the standard ANN construction. Table index is baked into the bucket id so a
    single (bucket) equi-join key suffices downstream."""
    cols = []
    for ti, planes in enumerate(tables):
        bucket = lsh_hyperplane_bits(a, planes)
        # disjoint bucket spaces per table: shift in the table index
        cols.append(bucket + F.lit(ti << 56).cast("bigint"))
    return F.array(*cols)


def lsh_hyperplane_bits(a: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of dot product),
    packed into a BIGINT bucket id. ``planes`` must be driver-side constants
    (seeded, ≤ 63 planes) so the expression is a pure literal tree — executors
    evaluate it with no shuffle and no Python.
    """
    if len(planes) > 63:
        raise ValueError("at most 63 hyperplanes (bits of a signed 64-bit bucket id)")
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(a, plane_col) >= 0, F.lit(1).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        bucket = bucket + (bit * F.lit(1 << i).cast("bigint"))
    return bucket
