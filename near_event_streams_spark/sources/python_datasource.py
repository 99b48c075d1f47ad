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
* The streaming reader tracks a ``(mtime, name)`` frontier PLUS the
  set of already-ingested names within a lag window in its offset JSON
  (a bare frontier would silently skip mtime-preserving copies / clock
  skew); ``readBetweenOffsets`` replays any committed range exactly, so
  checkpoint recovery is deterministic.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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
    """File-frontier micro-batch reader with a seen-file set.

    Offset = ``{"frontier": [mtime_ns, name], "seen": {name: mtime}}``.
    A bare (mtime, name) frontier silently skips any file that appears
    with mtime ≤ the committed frontier (a copy that preserves mtime,
    clock skew, a same-mtime name sorting earlier than the planned
    batch), so — like Spark's own file source — the offset also carries
    the names already ingested: a file joins the next batch iff it is
    NOT in ``seen`` and its mtime is within ``maxFileLagNs`` (default
    5 min) of the frontier. ``seen`` is pruned to that window, which
    bounds the offset size; a file landing with an mtime older than the
    window is dropped (the documented late-file limit, mirroring
    ``maxFileAge``). Replay of a committed (start, end] range re-reads
    exactly ``end.seen − start.seen``, so recovery is deterministic as
    long as ingested files are immutable (the drop-directory contract).
    """

    _DEFAULT_LAG_NS = 300 * 10**9  # 5 minutes

    def __init__(self, options):
        self.path = options.get("path")
        # Spark lower-cases data source option keys
        self.lag_ns = int(
            options.get("maxfilelagns", self._DEFAULT_LAG_NS)
        )

    def initialOffset(self) -> dict:  # noqa: N802 (Spark API)
        return {"frontier": [-1, ""], "seen": {}}

    def read(self, start: dict):
        fm, fn = start["frontier"]
        seen = dict(start.get("seen") or {})
        cutoff = fm - self.lag_ns
        new = sorted(
            (m, p)
            for m, p in _list_block_files(self.path)
            if m > cutoff and os.path.basename(p) not in seen
        )
        if not new:
            return iter([]), start
        top = max((m, os.path.basename(p)) for m, p in new)
        frontier = list(max((fm, fn), top))
        # prune with the START frontier's cutoff so every file ingested
        # THIS batch is still present in end.seen — that difference is
        # exactly what readBetweenOffsets replays
        kept = {n: m for n, m in seen.items() if m > cutoff}
        for m, p in new:
            kept[os.path.basename(p)] = m
        end = {"frontier": frontier, "seen": kept}
        # a LIST iterator, not a generator: the simple-reader prefetch
        # cache copy.copy()s and pickles the iterator it receives
        rows = [
            row for m, p in new for row in _read_file_rows(m, p)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        sseen = set(start.get("seen") or {})
        eseen = end.get("seen") or {}
        replay = {n for n in eseen if n not in sseen}
        return iter(
            [
                row
                for m, p in _list_block_files(self.path)
                if os.path.basename(p) in replay
                for row in _read_file_rows(m, p)
            ]
        )

    def commit(self, end: dict) -> None:
        pass


@dataclass
class _FileCommit(WriterCommitMessage):
    tmp_path: str
    final_name: str
    partition_id: int = 0


class _BlocksWriter(DataSourceWriter):
    """Two-phase-commit JSONL writer: every task writes a dot-prefixed
    tmp file (invisible to the reader's listing) and the DRIVER renames
    all of them into place only in ``commit()`` — a failed/speculative
    task aborts by deleting its tmp, so readers never observe a partial
    job. The same contract the parquet committer gives, expressed in the
    Python Data Source API."""

    def __init__(self, options, suffix: str = ""):
        self.path = options.get("path")
        self.suffix = suffix

    def write(self, iterator) -> _FileCommit:
        import uuid

        from pyspark import TaskContext

        os.makedirs(self.path, exist_ok=True)
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else 0
        token = uuid.uuid4().hex[:12]
        final_name = f"part-{pid:05d}-{token}{self.suffix}.jsonl"
        tmp = os.path.join(self.path, f".tmp-{token}")
        n = 0
        with open(tmp, "w", encoding="utf-8") as f:
            for row in iterator:
                f.write(row.block_json.rstrip("\n") + "\n")
                n += 1
        if n == 0:
            os.remove(tmp)
            return _FileCommit(tmp_path="", final_name="", partition_id=pid)
        return _FileCommit(
            tmp_path=tmp, final_name=final_name, partition_id=pid
        )

    def commit(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_path:
                os.rename(
                    m.tmp_path, os.path.join(self.path, m.final_name)
                )

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and m.tmp_path and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class _BlocksStreamWriter(DataSourceStreamWriter, _BlocksWriter):
    """Streaming flavor: same tmp-then-rename protocol per micro-batch,
    but the FINAL name is deterministic on ``(batchId, partitionId)``
    and committed with ``os.replace``. foreachBatch-style sinks are
    at-least-once — a crash after ``commit()`` but before the checkpoint
    records the batch replays it — so a replayed batch must OVERWRITE
    its own files rather than add a second uuid-named copy of every row
    (the offsets, and hence the partition contents, replay
    deterministically). The ``-b{batchId}`` marker also keys downstream
    compaction."""

    def __init__(self, options):
        _BlocksWriter.__init__(self, options)

    def write(self, iterator) -> _FileCommit:
        return _BlocksWriter.write(self, iterator)

    def commit(self, messages, batchId=None) -> None:  # noqa: N803
        for m in messages:
            if m is not None and m.tmp_path:
                final = f"part-{m.partition_id:05d}-b{batchId}.jsonl"
                # replace, not rename: idempotent under batch replay
                os.replace(m.tmp_path, os.path.join(self.path, final))

    def abort(self, messages, batchId=None) -> None:  # noqa: N803
        _BlocksWriter.abort(self, messages)


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

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _BlocksWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:  # noqa: N802
        return _BlocksStreamWriter(self.options)


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


def write_blocks(messages: DataFrame, path: str) -> None:
    """Serialize StreamerMessages back into a JSONL drop directory via
    the custom writer (two-phase commit: tmp files renamed into place
    only on job commit). ``to_json`` keeps serialization JVM-side; the
    Python writer only appends finished strings."""
    register(messages.sparkSession)
    (
        messages.select(F.to_json(F.struct("*")).alias("block_json"))
        .write.format("near_blocks")
        .option("path", path)
        .mode("append")
        .save()
    )
