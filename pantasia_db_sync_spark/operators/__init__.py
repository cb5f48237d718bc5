from .argmax import latest_state
from .asof import asof_join
from .components import connected_components, connected_components_logn
from .multimodal import (
    decode_bmp,
    decode_bmp_features,
    decode_png,
    decode_png_features,
    encode_bmp,
    encode_png,
)
from .rangejoin import band_join
from .similarity import kmeans_assign, kmeans_fit
from .surrogate import with_dense_ids
from .upsert import new_dimension_rows

__all__ = [
    "asof_join",
    "band_join",
    "connected_components",
    "connected_components_logn",
    "decode_bmp",
    "decode_bmp_features",
    "decode_png",
    "decode_png_features",
    "encode_bmp",
    "encode_png",
    "kmeans_assign",
    "kmeans_fit",
    "latest_state",
    "new_dimension_rows",
    "with_dense_ids",
]
