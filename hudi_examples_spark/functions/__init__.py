"""Engine function library.

- :mod:`hudi_examples_spark.functions.vectors` — embedding/vector math (cosine, dot,
  norms, LSH signatures) built on JVM-side higher-order functions.
- :mod:`hudi_examples_spark.functions.text` — tokenization, shingling, minhash/simhash
  signatures, quality scores, fingerprints.

Everything here returns Column expressions (composable, whole-stage-codegen friendly);
no row-at-a-time Python UDFs in hot paths.
"""

from hudi_examples_spark.functions.vectors import cosine_similarity, dot, l2_norm
from hudi_examples_spark.functions.text import (
    doc_fingerprint,
    quality_stopword_ratio,
    token_count,
    word_shingles,
    words,
)

__all__ = [
    "cosine_similarity",
    "dot",
    "l2_norm",
    "doc_fingerprint",
    "quality_stopword_ratio",
    "token_count",
    "word_shingles",
    "words",
]
