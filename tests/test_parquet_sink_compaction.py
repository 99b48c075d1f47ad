"""The batch-dir compaction machinery (`sinks/parquet_sink.py`) — the
r13 review fixes, each pinned:

* the in-place fold SKIPS dirs already at/above the target size (the
  previous cycle's merged output re-merged every cycle = quadratic
  lifetime write amplification on a 24/7 stream);
* `compact_batches(exclude_open=True)` honors the closed-batches-only
  contract for use while a stream is writing;
* the Z-order scale survives column spans past the old LONG-product
  overflow point (~2^47 at bits=16 — nanosecond epochs, snowflake ids).
"""

import glob

from pyspark.sql import functions as F

from near_event_streams_spark.sinks.parquet_sink import (
    compact_batch_dirs_inplace,
    compact_batches,
    zorder_key,
)


def _write_batches(spark, out, sizes):
    """One batch_id dir per entry; entry = rows in that batch."""
    for bid, n in sizes.items():
        (
            spark.range(n)
            .select(
                (F.col("id") + bid * 1_000_000).alias("k"),
                F.lit("x" * 64).alias("pad"),
                F.lit(bid).alias("batch_id"),
            )
            .write.mode("append")
            .partitionBy("batch_id")
            .parquet(out)
        )


def test_inplace_fold_skips_already_compacted_dirs(spark, tmp_path):
    """A dir at/above target_file_bytes must NOT be re-read and
    re-written by later cycles — only the new small dirs merge."""
    out = str(tmp_path / "corpus")
    _write_batches(spark, out, {0: 2000, 1: 5, 2: 5, 3: 5})
    # batch 0 (2000 padded rows) is well above a 20 KB target; 1 and 2
    # are tiny and closed; 3 is the open max batch
    n_merged, _ = compact_batch_dirs_inplace(
        spark, out, target_file_bytes=20 * 1024
    )
    assert n_merged == 2  # only batches 1 and 2 — 0 skipped, 3 open
    dirs = sorted(
        d.rsplit("=", 1)[1] for d in glob.glob(f"{out}/batch_id=*")
    )
    assert dirs == ["0", "2", "3"]  # merged landed at hi=2
    total = spark.read.parquet(out).count()
    assert total == 2015  # nothing lost, nothing duplicated
    # a second cycle finds <2 small closed dirs -> no-op
    assert compact_batch_dirs_inplace(
        spark, out, target_file_bytes=20 * 1024
    ) == (0, 0)


def test_compact_batches_exclude_open_leaves_max_batch(spark, tmp_path):
    src = str(tmp_path / "batches")
    _write_batches(spark, src, {0: 4, 1: 4, 2: 4})
    closed_out = str(tmp_path / "closed")
    n = compact_batches(
        spark,
        src,
        closed_out,
        partition_by=["pad"],
        exclude_open=True,
    )
    assert n == 8  # batches 0 and 1 only
    # default keeps the historical everything-in behavior
    all_out = str(tmp_path / "all")
    assert compact_batches(spark, src, all_out, partition_by=["pad"]) == 12


def test_zorder_key_survives_wide_spans(spark):
    """(c - lo) * 65535 in LONG wraps once the span passes ~2^47; the
    double-path scale must keep every key in [0, 4^bits) and keep the
    endpoints at the corners for a nanosecond-epoch-sized span."""
    lo, hi = 0, 1 << 55
    df = spark.createDataFrame(
        [(lo,), (hi // 2,), (hi,)], "v long"
    ).select(
        zorder_key(
            F.col("v"), F.col("v"), (lo, hi), (lo, hi), bits=16
        ).alias("z")
    )
    zs = [r["z"] for r in df.collect()]
    top = (1 << 32) - 1  # both 16-bit words fully set, interleaved
    assert all(0 <= z <= top for z in zs), zs
    assert zs[0] == 0
    assert zs[2] == top  # x=y=65535 -> every bit of the 32-bit key
    assert 0 < zs[1] < top
