from .hexstr import hex_to_string, lower_hex
from .text import (
    LANG_MARKERS,
    STOPWORDS,
    portable_hash60,
    portable_hash_mod,
    tokens_col,
)

__all__ = [
    "LANG_MARKERS",
    "STOPWORDS",
    "hex_to_string",
    "lower_hex",
    "portable_hash60",
    "portable_hash_mod",
    "tokens_col",
]
