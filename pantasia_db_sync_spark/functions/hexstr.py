"""Hex / binary string functions with Postgres-parity semantics.

The reference round-trips bytea through ``encode(col, 'hex')`` (always
lowercase in Postgres — /root/reference/app/db/postgres.py:335-337,371)
and decodes hex asset names to printable text with NUL sanitization and
a decode-failure fallback (``hex_to_string``,
/root/reference/app/misc.py:15-23). Everything here is JVM built-ins —
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lower_hex(col: Column | str) -> Column:
    """Postgres ``encode(col,'hex')`` parity: Spark hex() is uppercase,
    Postgres emits lowercase (app/db/postgres.py:335)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.hex(c))


def hex_to_string(hex_col: Column | str) -> Column:
    """``hex_to_string`` (app/misc.py:15-23): unhex → UTF-8, NUL→space,
    falling back to the raw hex when the bytes are not valid UTF-8.

    The reference also doubles single quotes — that was SQL-injection
    escaping for its string-spliced INSERTs, not data semantics, so it
    is deliberately dropped (SURVEY.md §2.B7).
    """
    h = F.col(hex_col) if isinstance(hex_col, str) else hex_col
    decoded = F.try_to_binary(h, F.lit("hex"))
    # ANSI mode makes `decode` raise on malformed UTF-8; gate it behind
    # is_valid_utf8 (CASE branches evaluate lazily) and mirror the
    # reference's UnicodeDecodeError fallback to the raw hex form.
    return F.when(
        decoded.isNull() | ~F.is_valid_utf8(decoded), h
    ).otherwise(F.translate(F.decode(decoded, "UTF-8"), "\x00", " "))
