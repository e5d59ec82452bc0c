from .vector import (
    METRICS,
    cosine_distance,
    distance_expr,
    dot,
    dot_product_distance,
    euclidean_distance,
    l2_norm,
    normalize_float,
)

__all__ = [
    "METRICS",
    "cosine_distance",
    "distance_expr",
    "dot",
    "dot_product_distance",
    "euclidean_distance",
    "l2_norm",
    "normalize_float",
]
