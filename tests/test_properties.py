"""Property-based tests (hypothesis) for the operators whose
correctness is a *property*, not a fixture match: dense-id assignment,
salted-join equivalence, and hex-decode reference parity."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from pantasia_db_sync_spark.operators.surrogate import with_dense_ids
from pantasia_db_sync_spark.operators.skew import salted_join

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 50), st.integers(-1000, 1000)),
        min_size=1,
        max_size=200,
        unique=True,
    ),
    start=st.integers(1, 10_000),
)
def test_dense_ids_are_dense_and_ordered(spark, rows, start):
    """ids are exactly start..start+n-1 with no gaps, and id order
    equals the order_cols order — for ANY input and ANY seed."""
    df = spark.createDataFrame(rows, "k int, v int")
    out = with_dense_ids(df, ["k", "v"], id_col="id", start=start).collect()
    got = sorted((r["id"], (r["k"], r["v"])) for r in out)
    assert [i for i, _ in got] == list(range(start, start + len(rows)))
    assert [kv for _, kv in got] == sorted(rows)


@settings(**SETTINGS)
@given(
    probe=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
        min_size=0,
        max_size=200,
        unique_by=lambda t: t[1],
    ),
    build=st.lists(
        st.tuples(st.integers(0, 3), st.text("ab", min_size=1, max_size=3)),
        min_size=0,
        max_size=10,
        unique_by=lambda t: t[0],
    ),
    salt=st.integers(1, 16),
)
def test_salted_join_equals_plain_join(spark, probe, build, salt):
    p = spark.createDataFrame(probe, "k int, rid int") if probe else None
    b = spark.createDataFrame(build, "k int, tag string") if build else None
    if p is None or b is None:
        return
    plain = sorted(
        (r["k"], r["rid"], r["tag"]) for r in p.join(b, "k").collect()
    )
    salted = sorted(
        (r["k"], r["rid"], r["tag"])
        for r in salted_join(p, b, on=["k"], scatter_col="rid", salt_parts=salt).collect()
    )
    assert salted == plain


def _reference_hex_to_string(h: str) -> str:
    """Faithful mirror of the reference's hex_to_string
    (/root/reference/app/misc.py:15-23) minus the SQL-quoting hack:
    decode hex → UTF-8; on failure return the hex; NUL → space."""
    try:
        s = bytes.fromhex(h).decode("utf-8")
    except (ValueError, UnicodeDecodeError):
        return h
    return s.replace("\x00", " ")


@settings(**SETTINGS)
@given(
    blobs=st.lists(st.binary(min_size=0, max_size=32), min_size=1, max_size=50)
)
def test_hex_to_string_matches_reference(spark, blobs):
    from pantasia_db_sync_spark.functions.hexstr import hex_to_string

    hexes = [(b.hex(),) for b in blobs]
    df = spark.createDataFrame(hexes, "h string")
    out = {
        r["h"]: r["out"]
        for r in df.select("h", hex_to_string("h").alias("out")).collect()
    }
    for (h,) in hexes:
        assert out[h] == _reference_hex_to_string(h), h
