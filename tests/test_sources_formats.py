"""Landing-zone format round trips: CSV and JSONL ingest must preserve
every value bit-for-bit when read back with an explicit schema —
including timestamps (timezone-exact ISO-8601) and doubles (Spark's
shortest-round-trippable float printing)."""

from __future__ import annotations

import pytest

from conftest import SF_DIR

from pantasia_db_sync_spark.sources.catalog import (
    load_table,
    load_table_as,
    write_table_as,
)


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize("table", ["orders", "events"])
def test_csv_roundtrip_bit_exact(spark, tmp_path, table):
    src = load_table(spark, SF_DIR, table)
    p = str(tmp_path / f"{table}_csv")
    write_table_as(src, p, "csv")
    back = load_table_as(spark, p, "csv", schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


@pytest.mark.parametrize("table", ["events", "embeddings", "documents"])
def test_jsonl_roundtrip_bit_exact(spark, tmp_path, table):
    """JSONL additionally carries nested arrays (embeddings)."""
    src = load_table(spark, SF_DIR, table)
    p = str(tmp_path / f"{table}_json")
    write_table_as(src, p, "json")
    back = load_table_as(spark, p, "json", schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_unknown_format_rejected(spark, tmp_path):
    src = load_table(spark, SF_DIR, "orders")
    with pytest.raises(ValueError):
        write_table_as(src, str(tmp_path / "x"), "avro")
    with pytest.raises(ValueError):
        load_table_as(spark, str(tmp_path / "x"), "avro")


@pytest.mark.parametrize("table", ["orders", "events"])
def test_xml_roundtrip_bit_exact(spark, tmp_path, table):
    """XML is native in Spark 4 (spark-xml merged into core): the
    enterprise-feed landing format must round-trip values bit-exactly
    under an explicit schema, same contract as CSV/JSONL."""
    src = load_table(spark, SF_DIR, table)
    p = str(tmp_path / f"{table}_xml")
    write_table_as(src, p, "xml")
    back = load_table_as(spark, p, "xml", schema=src.schema)
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


@pytest.mark.parametrize("table", ["orders", "events"])
def test_orc_roundtrip_bit_exact(spark, tmp_path, table):
    src = load_table(spark, SF_DIR, table)
    path = str(tmp_path / f"{table}_orc")
    write_table_as(src, path, "orc")
    back = load_table_as(spark, path, "orc")
    assert back.schema == src.schema
    assert _rows(back) == _rows(src)


def test_text_corpus_roundtrip(spark, tmp_path):
    """One-doc-per-line corpus landing: a single string column survives
    the trip; a multi-column frame is refused rather than flattened."""
    src = load_table(spark, SF_DIR, "documents").select("text")
    path = str(tmp_path / "docs_text")
    write_table_as(src, path, "text")
    back = load_table_as(spark, path, "text")
    assert back.columns == ["value"]
    assert sorted(r[0] for r in back.collect()) == sorted(
        r[0] for r in src.collect()
    )
    with pytest.raises(ValueError, match="one string column"):
        write_table_as(
            load_table(spark, SF_DIR, "documents").select("doc_id", "text"),
            str(tmp_path / "bad"),
            "text",
        )


def test_python_datasource_pushdown_prunes_partitions(spark):
    """The Spark-4 custom Python data source: pushed row_id range
    filters must shrink the generated range AND drop whole partitions
    (the task-pruning that makes a pushed filter a range read instead
    of a full scan in a real backing store)."""
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    from pantasia_db_sync_spark.sources.pydatasource import (
        LedgerReader,
        ledger_row,
        register_ledger_source,
    )

    r = LedgerReader({"rows": "100000", "parts": "8"})
    assert len(r.partitions()) == 8
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("row_id",), 80_000),
                LessThan(("row_id",), 92_000),
            ]
        )
    )
    assert leftover == []  # fully consumed
    parts = r.partitions()
    assert len(parts) == 2  # [80000,87500) and [87500,92000)
    assert min(p.start for p in parts) == 80_000
    assert max(p.end for p in parts) == 92_000

    # end-to-end: the read honors pushed bounds and row arithmetic
    register_ledger_source(spark)
    df = (
        spark.read.format("synthetic_ledger")
        .option("rows", 100_000)
        .option("parts", 8)
        .load()
        .where("row_id >= 99990")
    )
    rows = sorted(tuple(x) for x in df.collect())
    assert rows == [ledger_row(i) for i in range(99_990, 100_000)]
