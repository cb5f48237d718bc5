"""Z-order (Morton) clustering expression — multi-column data layout.

Single-column sort-on-write (`TableStore.append(cluster_by=...)`) gives
files disjoint ranges of ONE column; a range filter on any other column
still touches every file. Interleaving the bits of several quantized
columns into one Morton value and range-partitioning on THAT bounds
each file to a small hyper-rectangle of the combined key space — so
footer min/max stats stay narrow on EVERY participating column, and a
predicate on any one of them prunes files/row-groups. This is the
OPTIMIZE ZORDER BY of the lakehouse engines, expressed as a pure
Catalyst expression (shift/and/or over quantized ranks — whole-stage
codegen, no UDF).

Readers never see the z-value: pruning rides the ORDINARY per-column
parquet statistics that the layout tightens. The z-column is dropped
after the shuffle.

Quantization uses per-column [min, max] scalars probed with one tiny
agg job (two scalars per column — the same metadata-scale collect class
as the store's tip probes). Uniform quantization is a LAYOUT choice,
not a correctness one: skewed columns just cluster less evenly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16  # per column; 2 cols → 32-bit z, 3 cols → 48-bit


def _quantize(col: Column, lo, hi, bits: int) -> Column:
    """Map numeric/timestamp col into [0, 2^bits) by linear scaling.

    Timestamps quantize via epoch seconds; constant columns (hi == lo)
    collapse to bucket 0. Nulls land in bucket 0 (they sort first)."""
    span = F.lit(hi) - F.lit(lo)
    scaled = F.when(
        span > 0,
        ((col - F.lit(lo)).cast("double") / span.cast("double"))
        * F.lit((1 << bits) - 1),
    ).otherwise(F.lit(0.0))
    return F.coalesce(
        F.least(
            F.greatest(scaled.cast("bigint"), F.lit(0)), F.lit((1 << bits) - 1)
        ),
        F.lit(0),
    )


def _to_numeric(col: Column, dtype: str) -> Column:
    if dtype.startswith("timestamp"):
        return F.unix_timestamp(col).cast("bigint")
    if dtype == "date":
        # DATE cannot cast to DOUBLE in Spark — go through epoch days
        return F.unix_date(col).cast("bigint")
    return col.cast("double")


def zorder_value(
    df: DataFrame, cols: list[str], bits: int = ZORDER_BITS
) -> Column:
    """The Morton interleave of ``cols`` quantized to ``bits`` each.

    Probes each column's [min, max] with ONE combined agg job (2×|cols|
    scalars to the driver) and builds the interleave as a literal-bound
    expression. Bit i of column j lands at position i·|cols| + j."""
    dtypes = dict(df.dtypes)
    numeric = {c: _to_numeric(F.col(c), dtypes[c]) for c in cols}
    aggs = []
    for c in cols:
        aggs.append(F.min(numeric[c]).alias(f"__lo_{c}"))
        aggs.append(F.max(numeric[c]).alias(f"__hi_{c}"))
    row = df.agg(*aggs).collect()[0]

    n = len(cols)
    z = F.lit(0).cast("bigint")
    for j, c in enumerate(cols):
        q = _quantize(numeric[c], row[f"__lo_{c}"], row[f"__hi_{c}"], bits)
        for i in range(bits):
            bit = F.shiftright(q, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def zorder_frame(
    df: DataFrame,
    cols: list[str],
    num_partitions: int | None = None,
    bits: int = ZORDER_BITS,
) -> DataFrame:
    """Range-partition + sort ``df`` by the Morton value of ``cols``,
    then drop the helper column — the write-side half of OPTIMIZE
    ZORDER. Each output partition (→ parquet file) covers a contiguous
    z-range = a bounded region of the multi-column space, so every
    participating column's footer min/max is narrow."""
    z = zorder_value(df, cols, bits)
    zdf = df.withColumn("__z", z)
    if num_partitions is not None:
        zdf = zdf.repartitionByRange(num_partitions, "__z")
    else:
        zdf = zdf.repartitionByRange("__z")
    return zdf.sortWithinPartitions("__z").drop("__z")
