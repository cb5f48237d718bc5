"""Text-analysis column functions (LLM-data-pipeline surface).

These back the ``documents``-table operators required beyond the
reference (BASELINE.json north-star): tokenization, quality metrics,
language-ID heuristics, fingerprints, and the engine-portable hash used
by MinHash/SimHash so the DuckDB oracles can reproduce signatures
bit-for-bit (md5 is identical across engines; native hash() is not).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31 - 1: keeps (a*x + b) inside int64 for a, x < 2^31.
HASH_PRIME = 2147483647

STOPWORDS = ("the", "a", "of", "and")

# marker tokens per language for the n-gram/stopword language-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "und", "das"),
    "es": ("el", "la", "y", "los"),
    "fr": ("le", "les", "et", "une"),
}


def tokens_col(text_col: Column | str) -> Column:
    """Whitespace tokenization, identical to the oracle's
    ``string_split(trim(text), ' ')`` (fixture text is single-spaced)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(F.trim(c), " ")


def portable_hash60(col: Column | str) -> Column:
    """String → 60-bit integer via the first 15 hex chars of md5.

    Engine-portable: DuckDB computes the same value as
    ``CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def portable_hash_mod(col: Column | str, mod: int = HASH_PRIME) -> Column:
    """60-bit portable hash reduced mod ``mod`` (default the Mersenne
    prime used by the MinHash permutation family)."""
    return portable_hash60(col) % F.lit(mod)


def minhash_params(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for h_i(x) = (a*x + b) mod P.

    Derived from fixed LCG constants so the oracle SQL embeds the very
    same literals; all values < 2^31 so products stay inside int64.
    """
    params = []
    for i in range(1, num_hashes + 1):
        a = (1103515245 * i + 12345) % HASH_PRIME
        b = (69069 * i + 1013904223) % HASH_PRIME
        params.append((a or 1, b))
    return params


import pandas as pd
import unicodedata

from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType


def _strip_marks_str(x: str) -> str:
    """NFD-decompose, drop combining marks (Mn), NFC-recompose,
    casefold — the unicode canonicalization every multilingual corpus
    pipeline applies first. Pure stdlib; the DuckDB oracle's
    ICU-backed lower(strip_accents(...)) is the independent
    cross-implementation check."""
    decomp = unicodedata.normalize("NFD", x)
    kept = "".join(c for c in decomp if unicodedata.category(c) != "Mn")
    return unicodedata.normalize("NFC", kept).lower()


@pandas_udf(StringType())
def strip_marks(s: pd.Series) -> pd.Series:
    return s.map(_strip_marks_str, na_action="ignore")
