"""Unit tests for the JDBC option/predicate construction (pure logic —
no database needed; only .load()/.save() require a server)."""

from __future__ import annotations

from datetime import datetime

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pantasia_db_sync_spark.sources.jdbc import (
    jdbc_options,
    period_predicate,
    stride_predicates,
)


def test_period_predicate_half_open():
    p = period_predicate(
        "b3.time", datetime(2022, 1, 1, 0, 0, 0), datetime(2022, 1, 1, 2, 0, 0)
    )
    assert p == (
        "b3.time > TIMESTAMP '2022-01-01 00:00:00.000000' "
        "AND b3.time <= TIMESTAMP '2022-01-01 02:00:00.000000'"
    )


def test_period_predicate_keeps_sub_second_precision():
    """The sink tip is max(tx_time) at full precision — truncating
    fractional seconds would re-read (duplicate) the truncated
    interval on the next period."""
    p = period_predicate(
        "t",
        datetime(2022, 1, 1, 0, 0, 0, 500000),
        datetime(2022, 1, 1, 2, 0, 0, 123456),
    )
    assert "00:00:00.500000" in p and "02:00:00.123456" in p


def test_options_plain_table():
    opts = jdbc_options("jdbc:postgresql://h/db", "tx_out")
    assert opts == {
        "url": "jdbc:postgresql://h/db",
        "dbtable": "tx_out",
        "fetchsize": "10000",
    }


def test_options_predicate_becomes_subquery():
    opts = jdbc_options("u", "tx_out", predicate="id > 5")
    assert opts["dbtable"] == "(SELECT * FROM tx_out WHERE id > 5) src"


def test_options_partitioned():
    opts = jdbc_options(
        "u", "tx_out", partition_column="id", lower_bound=1,
        upper_bound=1_000_001, num_partitions=32,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "1000001"
    assert opts["numPartitions"] == "32"


def test_options_partitioned_requires_bounds():
    with pytest.raises(ValueError):
        jdbc_options("u", "t", partition_column="id")
    with pytest.raises(ValueError):
        jdbc_options("u", "t", partition_column="id", lower_bound=9, upper_bound=9)


def _covering_partition(preds: list[str], value: int | None) -> list[int]:
    """Indexes of predicates a row with this column value satisfies
    (evaluated with plain python semantics matching the SQL)."""
    hit = []
    for i, p in enumerate(preds):
        if p == "1=1":
            ok = True
        elif value is None:
            ok = "IS NULL" in p
        else:
            clauses = p.replace(" OR ", " AND ").split(" AND ")
            ok = True
            for c in clauses:
                c = c.strip()
                if c.endswith("IS NULL"):
                    continue
                col, op, bound = c.split()
                if op == "<":
                    ok = ok and value < int(bound)
                elif op == ">=":
                    ok = ok and value >= int(bound)
        if ok:
            hit.append(i)
    return hit


@settings(max_examples=50, deadline=None)
@given(
    lower=st.integers(-1000, 1000),
    width=st.integers(1, 10_000),
    n=st.integers(1, 64),
    probe=st.lists(st.one_of(st.none(), st.integers(-5000, 15_000)), max_size=20),
)
def test_stride_predicates_exclusive_and_exhaustive(lower, width, n, probe):
    """Every value — including NULL, below-lower, and at-or-above-upper
    — matches EXACTLY one stride predicate (Spark JDBCRelation
    semantics: no row is dropped or duplicated by partitioning)."""
    upper = lower + width
    preds = stride_predicates("id", lower, upper, n)
    assert len(preds) == n
    for v in list(probe) + [None, lower - 1, lower, upper - 1, upper, upper + 10]:
        hits = _covering_partition(preds, v)
        assert len(hits) == 1, (v, preds, hits)


def test_stride_predicates_single_partition_matches_all():
    assert stride_predicates("id", 0, 100, 1) == ["1=1"]


# ---------------------------------------------------------------------------
# LIVE round trip: embedded Derby (ships in Spark's jars — no server,
# no network) exercises the actual .save()/.load() path the pure
# builders above only construct.
# ---------------------------------------------------------------------------


def _derby_url(tmp_path) -> str:
    return f"jdbc:derby:{tmp_path}/livedb;create=true"


def test_jdbc_live_roundtrip_partitioned(spark, tmp_path):
    """write_jdbc → Derby → read_jdbc with a 4-way partitioned scan:
    every row survives, and the scan really runs as 4 JDBC partitions."""
    from datetime import datetime, timedelta

    from pantasia_db_sync_spark.sources.jdbc import (
        period_predicate,
        read_jdbc,
        stride_predicates,
        write_jdbc,
    )

    url = _derby_url(tmp_path)
    base = datetime(2024, 1, 1)
    rows = [
        (i, f"addr_{i:04d}", float(i) * 1.5, base + timedelta(minutes=i))
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "id int, address string, amount double, ts timestamp")
    write_jdbc(df, url, "events_live", mode="overwrite")

    back = read_jdbc(
        spark,
        url,
        "events_live",
        partition_column="id",
        num_partitions=4,
        lower_bound=0,
        upper_bound=500,
    )
    assert back.rdd.getNumPartitions() == 4
    assert sorted(tuple(r) for r in back.collect()) == sorted(rows)

    # pushdown predicate: the reference's per-period half-open filter.
    # period_predicate emits the ANSI/Postgres TIMESTAMP literal; Derby
    # only accepts the TIMESTAMP() function form, so the live test sends
    # the same half-open shape in Derby's dialect (the literal form is
    # covered by the unit tests above).
    lo, hi = base + timedelta(minutes=99), base + timedelta(minutes=199)
    ansi = period_predicate("ts", lo, hi)
    assert "ts > TIMESTAMP '2024-01-01 01:39:00.000000'" in ansi
    # (Spark's JDBC writer creates quoted lowercase columns; unquoted
    # identifiers fold to uppercase in Derby, hence the quotes.)
    derby_pred = (
        f"\"ts\" > TIMESTAMP('{lo:%Y-%m-%d %H:%M:%S}') "
        f"AND \"ts\" <= TIMESTAMP('{hi:%Y-%m-%d %H:%M:%S}')"
    )
    windowed = read_jdbc(spark, url, "events_live", predicate=derby_pred)
    assert sorted(r["id"] for r in windowed.collect()) == list(range(100, 200))

    # custom stride predicates (the predicates= API): exhaustive + exclusive
    preds = stride_predicates('"id"', 0, 500, 5)
    strided = spark.read.jdbc(url, "events_live", predicates=preds)
    assert strided.rdd.getNumPartitions() == 5
    assert strided.count() == 500


def test_jdbc_live_append_and_batch(spark, tmp_path):
    """A7-style batched appends accumulate without clobbering."""
    from pantasia_db_sync_spark.sources.jdbc import read_jdbc, write_jdbc

    url = _derby_url(tmp_path)
    df1 = spark.createDataFrame([(i, f"w{i}") for i in range(100)], "id int, tag string")
    df2 = spark.createDataFrame([(i, f"w{i}") for i in range(100, 150)], "id int, tag string")
    write_jdbc(df1, url, "dim_live", mode="overwrite", batch_size=16)
    write_jdbc(df2, url, "dim_live", mode="append", batch_size=16)
    got = read_jdbc(spark, url, "dim_live")
    assert got.count() == 150
    assert {r["id"] for r in got.collect()} == set(range(150))
