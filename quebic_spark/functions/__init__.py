from quebic_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from quebic_spark.functions.text import (
    fingerprint,
    minhash_signature,
    normalized_text,
    shingles,
    tokens,
)

__all__ = [
    "cosine_similarity",
    "dot_product",
    "fingerprint",
    "l2_norm",
    "minhash_signature",
    "normalized_text",
    "shingles",
    "tokens",
]
