"""Multi-dimensional data layout: z-order (Morton) clustering for
parquet min/max data skipping.

A 100 TB table sorted on one column prunes scans on THAT column only;
interleaving the bits of several quantized columns (the z-order curve —
what Delta/Iceberg `OPTIMIZE ZORDER BY` implements) gives every indexed
column locality, so per-file min/max statistics prune selective scans on
ANY of them. Everything here is exact integer/float-step arithmetic —
no sampling — so the same layout is reproducible across engines and
re-runs (unlike `repartitionByRange`, whose boundaries come from
reservoir sampling).

The write path composes with ``util.staged_overwrite``:
``df.repartition(F.col("z_shard")).sortWithinPartitions("z_key")`` then
write — files then carry tight bounding boxes over every z-indexed
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_minmax(col, lo, hi, bits: int):
    """Linear min-max quantization of a numeric column to [0, 2^bits):
    floor((x-lo)/(hi-lo) · (2^bits−1)). One double divide+multiply+floor
    — identical in any IEEE engine given identical bounds. Degenerate
    (lo == hi) columns quantize to 0."""
    span = F.lit(float(hi)) - F.lit(float(lo))
    scaled = F.when(span == 0, F.lit(0.0)).otherwise(
        (col.cast("double") - F.lit(float(lo))) / span * F.lit(float((1 << bits) - 1))
    )
    return F.floor(scaled).cast("long")


def interleave_bits(cols: list, bits: int):
    """Morton-interleave k quantized columns (each in [0, 2^bits)): output
    bit (i·k + j) = bit i of cols[k-1-j] — pure shift/and/or arithmetic,
    bit-identical in DuckDB. k·bits must fit a signed long (≤ 62)."""
    k = len(cols)
    if k * bits > 62:
        raise ValueError("k*bits must fit a signed long")
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cols):
            # column j contributes to output bit i*k + (k-1-j): earlier
            # cols get the higher bit within each group
            out_bit = i * k + (k - 1 - j)
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), out_bit
                )
            )
    return z


def interleave_bits_sql(exprs: list[str], bits: int) -> str:
    """DuckDB rendering of :func:`interleave_bits` (for oracle parity)."""
    k = len(exprs)
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            out_bit = i * k + (k - 1 - j)
            terms.append(f"((({e} >> {i}) & 1) << {out_bit})")
    return " | ".join(terms)


def zorder_keys(
    df: DataFrame,
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 12,
    n_shards: int = 64,
) -> DataFrame:
    """Attach ``z_key`` (the Morton code over min-max-quantized ``cols``)
    and ``z_shard`` (the key's top log2(n_shards) bits — a FIXED range
    split, not a sampled one, so the shard of a row is a pure function of
    its values and the bounds).

    ``bounds`` are the (lo, hi) per column — at scale these come from one
    cheap min/max aggregate (or existing table statistics); passing them
    in keeps this function a pure map and the layout reproducible even as
    new data arrives (frozen bounds → stable shard meaning).
    """
    if n_shards & (n_shards - 1):
        raise ValueError("n_shards must be a power of two")
    shard_bits = n_shards.bit_length() - 1
    total_bits = bits * len(cols)
    q = [
        quantize_minmax(F.col(c), bounds[c][0], bounds[c][1], bits) for c in cols
    ]
    z = interleave_bits(q, bits)
    out = df.withColumn("z_key", z)
    return out.withColumn(
        "z_shard", F.shiftright(F.col("z_key"), total_bits - shard_bits).cast("int")
    )


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """One aggregate for the quantization bounds (2 doubles per column)."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c)).alias(f"_lo_{c}"), F.max(F.col(c)).alias(f"_hi_{c}")]
    row = df.agg(*aggs).collect()[0]
    return {c: (float(row[f"_lo_{c}"]), float(row[f"_hi_{c}"])) for c in cols}


def sorted_export(df: DataFrame, sort_cols: list[str], n_files: int | None = None) -> DataFrame:
    """Globally ordered single-column-sorted export — the distributed form
    of ``ORDER BY`` for final dataset materialization: range-partition on
    the sort key (boundaries from Spark's reservoir sample → balanced
    tasks), then sort within each partition. File *i*'s keys all precede
    file *i+1*'s, so a consumer reading files in partition order streams
    the table in key order; no single task ever holds more than ~1/n of
    the data (a bare ``orderBy`` before a write plans the same shape, but
    making the partition count explicit here pins the file-size contract).

    Use z-order (``zorder_keys``) instead when MULTIPLE columns need
    skipping locality; use this when one key's total order is the product
    (time-ordered training shards, sorted merge inputs). Note the sampled
    boundaries make file SPLITS nondeterministic across runs — the row
    ORDER is still total and reproducible; pair with ``zorder_keys`` when
    bit-identical layout matters."""
    n = n_files or df.sparkSession.sparkContext.defaultParallelism
    return df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)


def compact_parquet_dir(
    spark,
    path: str,
    target_file_mb: int = 128,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction (the lakehouse ``OPTIMIZE`` verb) for a
    parquet directory: rewrite the data into files sized for the scan
    path — streaming sinks and per-epoch appends leave thousands of tiny
    files, and at 100 TB every scan then pays file-open latency and
    footer reads instead of sequential column reads.

    Target file count = ceil(on-disk bytes / target_file_mb); the rewrite
    is one `repartition(n)` (plus an optional `sortWithinPartitions` to
    restore clustering for min/max pruning — pass the z-order/sort keys
    the table was laid out with, since a bare repartition destroys
    clustering). Content is checksum-identical by construction; the
    rewrite routes through `staged_overwrite`, so a crash mid-rewrite
    leaves the stage as the recovery copy, never a half-written table.

    Returns {files_before, files_after, bytes}.
    """
    import glob as _glob
    import math
    import os as _os

    from ..util import staged_overwrite

    data_files = [
        p
        for p in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        + _glob.glob(_os.path.join(path, "**", "part-*"), recursive=True)
        if _os.path.isfile(p) and not _os.path.basename(p).startswith(("_", "."))
    ]
    data_files = sorted(set(data_files))
    total = sum(_os.path.getsize(p) for p in data_files)
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    # hive-partitioned layout (epoch=/shard=/bucket= dirs): preserve it —
    # a flat rewrite would silently destroy partition pruning for every
    # downstream reader
    part_cols = sorted(
        {
            d.split("=", 1)[0]
            for d in _os.listdir(path)
            if "=" in d and _os.path.isdir(_os.path.join(path, d))
        }
    )
    if part_cols:
        out = df.repartition(n, *part_cols)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        stage = path + ".stage"
        out.write.mode("overwrite").partitionBy(*part_cols).parquet(stage)
        spark.read.parquet(stage).write.mode("overwrite").partitionBy(
            *part_cols
        ).parquet(path)
        import shutil as _shutil

        _shutil.rmtree(stage, ignore_errors=True)
    else:
        out = df.repartition(n)
        if sort_cols:
            out = out.sortWithinPartitions(*sort_cols)
        staged_overwrite(spark, out, path)
    after = [
        p
        for p in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
        if _os.path.isfile(p) and not _os.path.basename(p).startswith(("_", "."))
    ]
    return {
        "files_before": len(data_files),
        "files_after": len(after),
        "bytes": total,
        "partition_cols": part_cols,
    }
