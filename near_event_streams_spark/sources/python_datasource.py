"""``near_blocks`` — a Spark 4 Python Data Source for block drops.

The reference consumes blocks from an embedded node over an mpsc channel
(``src/main.rs:44,112``); its other deployment mode is a NEAR Lake-style
object-store/directory of JSON block files. This module expresses that
second mode as a first-class ``spark.read.format("near_blocks")`` /
``spark.readStream.format("near_blocks")`` source via the Python Data
Source API — the Spark-native way to add a custom connector without JVM
code.

Design for scale:

* The Python side emits only ``(path, mtime, line_no, block_json)`` —
  raw JSON strings in Arrow batches. The heavy work (parsing the nested
  StreamerMessage envelope) happens JVM-side via ``from_json`` in
  :func:`parse_raw_blocks`, inside whole-stage codegen — the Python
  worker never walks the nested structure.
* Batch reads get ONE InputPartition PER FILE, so a directory of block
  files fans out across executors.
* The streaming reader tracks a monotonic ``(mtime, name)`` frontier in
  its offset JSON; ``readBetweenOffsets`` replays any committed range
  exactly, so checkpoint recovery is deterministic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from near_event_streams_spark.schemas import STREAMER_MESSAGE_SCHEMA

_SCHEMA_DDL = "path string, mtime long, line_no int, block_json string"


def _list_block_files(path: str) -> list[tuple[int, str]]:
    """(mtime_ns, abspath) for every data file under ``path``, sorted by
    the same (mtime, name) order Spark's own file source uses."""
    out: list[tuple[int, str]] = []
    if not os.path.isdir(path):
        return out
    for name in os.listdir(path):
        if name.startswith((".", "_")):
            continue
        full = os.path.join(path, name)
        if os.path.isfile(full):
            out.append((os.stat(full).st_mtime_ns, full))
    out.sort()
    return out


def _read_file_rows(mtime: int, full: str):
    with open(full, encoding="utf-8") as f:
        for i, line in enumerate(f):
            line = line.strip()
            if line:
                yield (full, mtime, i, line)


class _FilePartition(InputPartition):
    def __init__(self, mtime: int, path: str):
        self.mtime = mtime
        self.path = path


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")

    def partitions(self):
        files = _list_block_files(self.path)
        if not files:
            # Spark still schedules one task for an empty source and
            # passes partition=None to read()
            return [_FilePartition(0, "")]
        return [_FilePartition(m, p) for m, p in files]

    def read(self, partition: _FilePartition):
        if partition is None or not partition.path:
            return
        yield from _read_file_rows(partition.mtime, partition.path)


class _StreamReader(SimpleDataSourceStreamReader):
    """File-frontier micro-batch reader.

    Offset = ``{"frontier": [mtime_ns, name]}``: every file strictly
    beyond the frontier (ordered by (mtime, name)) belongs to the next
    batch. Replay of a committed (start, end] range re-reads exactly the
    files inside it, so recovery after a crash is deterministic as long
    as ingested files are immutable (the drop-directory contract).
    """

    def __init__(self, options):
        self.path = options.get("path")

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        return {"frontier": [-1, ""]}

    def _beyond(self, frontier):
        fm, fn = frontier
        return [
            (m, p)
            for m, p in _list_block_files(self.path)
            if (m, os.path.basename(p)) > (fm, fn)
        ]

    def read(self, start: dict):
        new = self._beyond(start["frontier"])
        if not new:
            return iter([]), start
        last_m, last_p = new[-1]
        end = {"frontier": [last_m, os.path.basename(last_p)]}
        # a LIST iterator, not a generator: the simple-reader prefetch
        # cache copy.copy()s and pickles the iterator it receives
        rows = [
            row for m, p in new for row in _read_file_rows(m, p)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        fm, fn = end["frontier"]
        return iter(
            [
                row
                for m, p in self._beyond(start["frontier"])
                if (m, os.path.basename(p)) <= (fm, fn)
                for row in _read_file_rows(m, p)
            ]
        )

    def commit(self, end: dict) -> None:
        pass


class NearBlocksDataSource(DataSource):
    """``format("near_blocks")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "near_blocks"

    def schema(self) -> str:
        return _SCHEMA_DDL

    def reader(self, schema) -> DataSourceReader:
        return _BatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(NearBlocksDataSource)


def parse_raw_blocks(raw: DataFrame) -> DataFrame:
    """JVM-side envelope parse of the raw ``block_json`` strings."""
    return raw.select(
        F.from_json("block_json", STREAMER_MESSAGE_SCHEMA).alias("m")
    ).select("m.*")


def read_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Batch StreamerMessages through the custom source (one partition
    per block file)."""
    register(spark)
    raw = spark.read.format("near_blocks").option("path", path).load()
    return parse_raw_blocks(raw)


def stream_blocks(spark: SparkSession, path: str) -> DataFrame:
    """Streaming StreamerMessages through the custom source."""
    register(spark)
    raw = spark.readStream.format("near_blocks").option("path", path).load()
    return parse_raw_blocks(raw)
