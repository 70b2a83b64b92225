from queryengine_spark.functions.text import (
    byte_bigrams,
    byte_length,
    char_bigrams,
    char_ngrams,
    tokenize_ws,
    ws_trim,
)
from queryengine_spark.functions.similarity import (
    cosine_similarity,
    cosine_similarity_expr,
    partial_ratio,
    partial_ratio_udf,
)

__all__ = [
    "byte_bigrams",
    "byte_length",
    "char_bigrams",
    "char_ngrams",
    "cosine_similarity",
    "cosine_similarity_expr",
    "partial_ratio",
    "partial_ratio_udf",
    "tokenize_ws",
    "ws_trim",
]
