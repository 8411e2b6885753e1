"""Whole-file text input as a pluggable Spark 4 Python DataSource.

The reference engine's only source is a custom one: the coordinator
opens each input file, reads the ENTIRE contents into memory, and
hands (filename, contents) to a map task — exactly one task per file
(`mr/coordinator.go:86-97`, nMap = len(files) at
`mr/coordinator.go:190,196-205`). ``sources/files.py:read_whole_files``
already reproduces that granularity on the built-in text reader; this
module rebuilds it as a *first-class pluggable source* via the
`pyspark.sql.datasource` API (public Spark 4 surface), which is the
Spark-idiomatic answer to "the engine lets you plug in a custom input
format":

- ``schema()`` declares (path, content) — the mapf argument pair
  (`mr/worker.go:36`).
- ``partitions()`` returns one ``InputPartition`` per file — the
  reference's task-per-file parallelism model, now scheduled by
  Spark's DAGScheduler instead of a hand-rolled coordinator loop.
- ``read(partition)`` runs ON THE EXECUTOR and opens only its own
  file — unlike the reference, where the coordinator reads every
  byte and ships it over RPC while holding the global mutex (its
  biggest scalability anti-pattern, SURVEY.md §3.4). The driver here
  touches only file NAMES.

Scale posture: a Python source pays one Python worker hop per
partition (Arrow-batched output, no per-row pickling), so the JVM
``text(wholetext=True)`` / ``binaryFile`` readers remain the
production path for plain files; the value of this module is the
pluggable-contract parity — the same class structure reads any
bespoke format (proprietary archives, API pages, tar shards of
training documents) with full task-level parallelism.
"""

from __future__ import annotations

import glob as _glob
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

FORMAT_NAME = "wholefile_text"


class WholeFileTextDataSource(DataSource):
    """``spark.read.format("wholefile_text").option("glob", pattern)``.

    Options:
      glob  — filesystem glob of input files (required). Hidden and
              Spark marker files (``_SUCCESS`` etc.) are skipped.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return "path string, content string"

    def reader(self, schema) -> "WholeFileTextReader":
        return WholeFileTextReader(self.options)


class WholeFileTextReader(DataSourceReader):
    def __init__(self, options) -> None:
        pattern = options.get("glob")
        if not pattern:
            raise ValueError("wholefile_text requires .option('glob', <pattern>)")
        self._pattern = pattern

    def partitions(self):
        # One partition per file == the reference's nMap = len(files)
        # (mr/coordinator.go:190). Planned on the driver from names
        # only; contents are never read here.
        paths = [
            p
            for p in sorted(_glob.glob(self._pattern))
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))
        ]
        return [InputPartition(p) for p in paths]

    def read(self, partition):
        # Executor-side: read this partition's single file whole, like
        # the reference map task receives it (mr/coordinator.go:92) —
        # but locally, not via a coordinator RPC hop.
        path = partition.value
        with open(path, "r", encoding="utf-8") as fh:
            yield (os.path.basename(path), fh.read())


def register_wholefile_source(spark: SparkSession) -> None:
    """Idempotently register the source under ``wholefile_text``."""
    spark.dataSource.register(WholeFileTextDataSource)


# --- Partitioned key/value text sink (A10) with atomic commit (A11) --


@dataclass
class _KVCommitMessage(WriterCommitMessage):
    """One per finished task: where its temp file landed and what the
    committed name should be — the payload of the reference's
    piggybacked completion report (mr/worker.go:60-61)."""

    tmp_path: str
    final_name: str


class KVTextSinkDataSource(DataSource):
    """``df.write.format("textkv_sink").option("path", dir).save()``.

    The reference's output contract rebuilt on the pluggable
    DataSourceWriter protocol, which has the SAME commit shape the
    reference hand-rolls:

    - each task writes ``key value\\n`` lines (mr/worker.go:152) to a
      temp file ``tmp-worker-<uid>-out-<partition>`` (mr/worker.go:136)
      and returns a commit message;
    - the driver's ``commit(messages)`` renames every temp file to its
      final ``mr-out-<partition>`` name (mr/coordinator.go:46-53,
      238-244) only after ALL tasks reported success — job-level
      atomicity (strictly stronger than the reference, which renames
      per-task as reports arrive);
    - ``abort()`` removes temp files, so a failed job leaves NO
      committed output — the property the reference gets from
      stale-owner rejection + tmp naming (mr/coordinator.go:35).

    Local/shared-filesystem sink (exactly the reference's assumption);
    the production path for distributed storage remains the JVM
    FileOutputCommitter formats. First two columns are written as
    (key, value); keys must not contain the separator — the
    reference's identical undocumented constraint (SURVEY.md §1.2).
    """

    @classmethod
    def name(cls) -> str:
        return "textkv_sink"

    def writer(self, schema, overwrite: bool) -> "KVTextSinkWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("textkv_sink requires .option('path', <dir>)")
        return KVTextSinkWriter(path, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "KVTextStreamSinkWriter":
        # fourth quadrant of the pluggable matrix (batch read/write and
        # stream read exist above): df.writeStream.format("textkv_sink")
        path = self.options.get("path")
        if not path:
            raise ValueError("textkv_sink requires .option('path', <dir>)")
        return KVTextStreamSinkWriter(path)


class KVTextSinkWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator) -> _KVCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"tmp-worker-{uuid.uuid4().hex}-out-{pid}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]} {row[1]}\n")
        return _KVCommitMessage(tmp_path=tmp, final_name=f"mr-out-{pid}")

    def commit(self, messages) -> None:
        if self.overwrite:
            for f in os.listdir(self.path):
                if f.startswith("mr-out-"):
                    os.remove(os.path.join(self.path, f))
        else:
            # Append mode must not silently clobber an earlier job's
            # committed partitions via os.replace (advisory finding):
            # fail fast BEFORE any rename so the job aborts atomically
            # (abort() then sweeps the temp files).
            existing = {
                f for f in os.listdir(self.path) if f.startswith("mr-out-")
            }
            clash = sorted({m.final_name for m in messages} & existing)
            if clash:
                raise FileExistsError(
                    f"textkv_sink append into {self.path!r} would overwrite "
                    f"committed output {clash}; use mode('overwrite') or an "
                    "empty directory"
                )
        for m in messages:
            os.replace(m.tmp_path, os.path.join(self.path, m.final_name))

    def abort(self, messages) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except (OSError, TypeError):
                pass


class KVTextStreamSinkWriter(DataSourceStreamWriter):
    """Streaming twin of KVTextSinkWriter: per micro-batch, each task
    stages ``key value\n`` lines to a temp file and ``commit(messages,
    batchId)`` publishes them under an immutable ``batch=<id>/``
    directory sealed with a ``_SUCCESS`` marker.

    EXACTLY-ONCE VISIBLE OUTPUT under replay: structured streaming
    re-runs a batch after a crash between sink-commit and offset-log
    commit; a replayed ``commit`` finds the marker already present,
    discards its temp files, and leaves the committed directory
    byte-identical — the idempotent-sink half of the end-to-end
    exactly-once contract (the engine's offset log is the other half).
    The marker is written AFTER all renames, so a torn batch directory
    (no marker) is invisible to the reader contract and simply
    overwritten by the replay.  Same local/shared-fs scope as the
    batch sink."""

    def __init__(self, path: str) -> None:
        self.path = path

    def write(self, iterator) -> _KVCommitMessage:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"tmp-stream-{uuid.uuid4().hex}-out-{pid}")
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row[0]} {row[1]}\n")
        return _KVCommitMessage(tmp_path=tmp, final_name=f"mr-out-{pid}")

    def commit(self, messages, batchId: int) -> None:
        bdir = os.path.join(self.path, f"batch={batchId}")
        marker = os.path.join(bdir, "_SUCCESS")
        if os.path.exists(marker):
            # replay of an already-committed batch: drop the staged
            # duplicates, keep the first commit (idempotence)
            for m in messages:
                try:
                    os.remove(m.tmp_path)
                except OSError:
                    pass
            return
        os.makedirs(bdir, exist_ok=True)
        for m in messages:
            os.replace(m.tmp_path, os.path.join(bdir, m.final_name))
        with open(marker, "w", encoding="utf-8"):
            pass

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            try:
                os.remove(m.tmp_path)
            except (OSError, TypeError):
                pass


def committed_stream_batches(path: str) -> list[str]:
    """Directories of batches whose ``_SUCCESS`` marker exists — the
    reader-side contract: torn (markerless) directories are invisible."""
    out = []
    for d in sorted(os.listdir(path)) if os.path.isdir(path) else []:
        full = os.path.join(path, d)
        if d.startswith("batch=") and os.path.exists(os.path.join(full, "_SUCCESS")):
            out.append(full)
    return out


def register_textkv_sink(spark: SparkSession) -> None:
    """Idempotently register the sink under ``textkv_sink``."""
    spark.dataSource.register(KVTextSinkDataSource)


# --- Streaming read: whole-file micro-batch replay ------------------


class WholeFileStreamDataSource(DataSource):
    """``spark.readStream.format("wholefile_stream")`` — the pluggable
    STREAMING quadrant of the whole-file contract: the staged file set
    is replayed in sorted-name order as ONE FILE PER PARTITION within a
    micro-batch (latestOffset exposes the whole available listing, so
    AvailableNow drains it in a single batch — the reference's
    task-per-file model on the streaming plane), each row carrying
    (path, content) exactly like the batch reader.

    Offsets are (index, last-served-name) pairs into the sorted
    listing, so the replay is deterministic and resumable: after a
    restart the checkpointed offset re-enters AFTER the named file —
    validated against the fresh listing, so a staging set that changed
    across the restart (new file sorting earlier, rename, deletion)
    resumes at the right file by NAME instead of silently re-serving
    or skipping by position (advisory finding). The Structured
    Streaming source contract (initialOffset/latestOffset/partitions/
    commit) in ~40 lines of Python. An unbounded deployment would
    re-list and serve the growing suffix; the fixture staging is
    bounded, which is what lets AvailableNow drain it for the
    batch-equivalence check.
    """

    @classmethod
    def name(cls) -> str:
        return "wholefile_stream"

    def schema(self) -> str:
        return "path string, content string"

    def streamReader(self, schema) -> "WholeFileStreamReader":
        return WholeFileStreamReader(self.options)


class WholeFileStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        pattern = options.get("glob")
        if not pattern:
            raise ValueError("wholefile_stream requires .option('glob', <pattern>)")
        self._files = [
            p
            for p in sorted(_glob.glob(pattern))
            if os.path.isfile(p) and not os.path.basename(p).startswith(("_", "."))
        ]

    def initialOffset(self) -> dict:
        return {"index": 0, "last": ""}

    def latestOffset(self) -> dict:
        # the full listing: AvailableNow snapshots this once and drains
        # to it (per-file batching would need the source to hold back
        # the offset, which AvailableNow's fixed endpoint ignores — it
        # would silently truncate the drain to the first increment)
        return {
            "index": len(self._files),
            "last": self._files[-1] if self._files else "",
        }

    def _resolve(self, off: dict) -> int:
        """Index of the first unserved file for ``off`` against the
        CURRENT listing. Positional fast path when the checkpointed
        (index, last) still agrees with the listing; otherwise resume
        by NAME — first file sorting strictly after the last served
        one (bisect on the sorted listing)."""
        idx, last = off.get("index", 0), off.get("last", "")
        if not last:
            # index 0 (fresh start) or a pre-name-format checkpoint:
            # fall back to the positional index, clamped to the listing.
            return min(idx, len(self._files))
        if 0 < idx <= len(self._files) and self._files[idx - 1] == last:
            return idx
        import bisect  # noqa: PLC0415

        return bisect.bisect_right(self._files, last)

    def partitions(self, start: dict, end: dict):
        return [
            InputPartition(self._files[i])
            for i in range(self._resolve(start), self._resolve(end))
        ]

    def read(self, partition):
        path = partition.value
        with open(path, "r", encoding="utf-8") as fh:
            yield (os.path.basename(path), fh.read())

    def commit(self, end: dict) -> None:
        # nothing to finalize: the checkpointed (index, last-name)
        # offset is self-describing — _resolve replays it against the
        # current listing (by name when the listing changed), so no
        # source-side bookkeeping survives past the offset itself
        pass


def register_wholefile_stream(spark: SparkSession) -> None:
    """Idempotently register the streaming source under
    ``wholefile_stream``."""
    spark.dataSource.register(WholeFileStreamDataSource)
