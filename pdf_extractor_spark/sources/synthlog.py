"""Custom connector via the Spark 4 Python Data Source API: a deterministic
synthetic log source with REAL partition planning and REAL filter pushdown.

Why this exists: the reference's source family (SURVEY §2.1, S1-S7) is
file/payload-shaped; a production Spark estate also ingests from systems
with no built-in connector, and since Spark 4 the sanctioned way to bolt
one on from Python is ``pyspark.sql.datasource``. This module exercises the
three contract points that make a connector scale rather than merely work:

- ``partitions()`` returns one ``InputPartition`` per row range, so the
  scan parallelizes across executors exactly like a parquet split list —
  never a single-task generator;
- ``pushFilters()`` accepts ``EqualTo('level', ...)`` and evaluates it
  INSIDE ``read()`` (rows never cross the Python->JVM boundary), returning
  every other filter for Spark to re-apply — the same contract parquet
  PushedFilters honors;
- content is a pure function of the row id (level cycles mod 4, bytes via
  a Knuth-hash formula), so a DuckDB oracle can replay the whole source
  from ``range()`` — the connector is oracle-checkable like any operator.

No wall-clock, no RNG: replays and retries of a partition yield identical
rows (the Spark task-retry contract a real connector must meet).
"""
from __future__ import annotations

from typing import Iterator, List

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    InputPartition,
)

LEVELS = ("debug", "info", "warn", "error")
BYTES_MULT = 2654435761  # Knuth multiplicative hash constant (public)
BYTES_MOD = 1000


class _RangePartition(InputPartition):
    def __init__(self, index: int, start: int, end: int):
        self.index, self.start, self.end = index, start, end


class SynthLogReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("rows", "1000"))
        self.n_parts = int(options.get("partitions", "8"))
        self.level_eq: str | None = None

    def pushFilters(self, filters: List[Filter]) -> Iterator[Filter]:
        for f in filters:
            if (
                isinstance(f, EqualTo)
                and f.attribute == ("level",)
                and self.level_eq is None
            ):
                self.level_eq = str(f.value)
            else:
                yield f  # unsupported: Spark re-applies it post-scan

    def partitions(self):
        step = max(1, -(-self.n // self.n_parts))
        return [
            _RangePartition(i, lo, min(lo + step, self.n))
            for i, lo in enumerate(range(0, self.n, step))
        ]

    def read(self, part: _RangePartition):
        want = self.level_eq
        for i in range(part.start, part.end):
            level = LEVELS[i % 4]
            if want is not None and level != want:
                continue  # pushed filter: the row never leaves Python
            yield (i, part.index, level, (i * BYTES_MULT) % BYTES_MOD)


class SynthLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthlog"

    def schema(self) -> str:
        return "row_id long, part int, level string, n_bytes long"

    def reader(self, schema):
        return SynthLogReader(self.options)


def register(spark) -> None:
    """Idempotent registration (re-registering the same name is fine)."""
    spark.dataSource.register(SynthLogDataSource)


# --- Streaming half: a custom streaming source with offset tracking -------------
from pyspark.sql.datasource import DataSourceStreamReader  # noqa: E402


class SynthLogStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming reads over the same deterministic rows:
    offsets are row positions, ``latestOffset`` advances ``batch_size``
    rows per micro-batch up to ``rows`` (a bounded replayable stream —
    the Kafka-topic shape without Kafka), ``partitions(start, end)``
    splits every micro-batch's offset range into executor-parallel
    splits, and ``read`` regenerates rows purely from position, so a
    replayed batch (checkpoint recovery) is byte-identical. Rate limiting
    lives in ``latestOffset`` (driver-side reader progress, the documented
    pattern) — NEVER in ``partitions``: capping there would silently drop
    the tail of a range Spark has already recorded as committed, the
    classic homemade-connector data-loss bug. ``commit`` is a no-op:
    durable progress lives in Spark's own offset checkpoint."""

    def __init__(self, options):
        self.rows = int(options.get("rows", "1000"))
        self.batch = int(options.get("batchsize", "400"))
        self.n_parts = int(options.get("partitions", "4"))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # expose at most one batch of new offsets per poll (rate limit)
        self._current = min(self._current + self.batch, self.rows)
        return {"pos": self._current}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["pos"]), int(end["pos"])
        # Checkpoint recovery: a fresh reader instance starts _current=0,
        # but Spark replays from the committed offset — adopt the replayed
        # range's end as reader progress so latestOffset resumes from the
        # restored position immediately instead of stalling for
        # ceil(committed/batch) polls while _current catches up.
        self._current = max(self._current, hi)
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [
            _RangePartition(i, p, min(p + step, hi))
            for i, p in enumerate(range(lo, hi, step))
        ] or [_RangePartition(0, lo, lo)]

    def read(self, part: _RangePartition):
        for i in range(part.start, part.end):
            yield (i, part.index, LEVELS[i % 4], (i * BYTES_MULT) % BYTES_MOD)

    def commit(self, end: dict) -> None:
        # Durable progress lives in Spark's offset checkpoint; locally we
        # only fold the committed position into reader progress (recovery
        # path — see partitions()).
        self._current = max(self._current, int(end["pos"]))


class SynthLogStreamDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthlog_stream"

    def schema(self) -> str:
        return "row_id long, part int, level string, n_bytes long"

    def streamReader(self, schema):
        return SynthLogStreamReader(self.options)


def register_stream(spark) -> None:
    spark.dataSource.register(SynthLogStreamDataSource)


# --- Sink half: a custom transactional writer --------------------------------------
import json as _json  # noqa: E402
import os as _os  # noqa: E402
from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileCommit(WriterCommitMessage):
    path: str
    n_rows: int


class ManifestSinkWriter(DataSourceWriter):
    """Transactional custom sink: every task stages its rows as a parquet
    file named by its (stable) partition id under ``_staging/``, returns a
    commit message, and only the DRIVER's ``commit`` publishes — moving
    files into place and writing ``manifest.json`` (paths + row counts +
    total) LAST, so a reader that requires the manifest can never observe
    a torn write (the fsio _SUCCESS discipline expressed through the
    DataSourceWriter contract). ``abort`` removes the staging debris. Task
    retries are safe: a retried partition overwrites its own staged file
    (deterministic name), and uncommitted attempts are invisible."""

    def __init__(self, options, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite
        # Per-write version (driver-side, monotone from the live manifest):
        # part files are named part-v{version}-{pid}, so a new write NEVER
        # mutates or collides with files the live manifest references —
        # overwrite can therefore publish the new manifest FIRST (the
        # commit point for manifest-readers) and delete stale parts after.
        prev = _os.path.join(self.path, "manifest.json")
        ver = 0
        if _os.path.exists(prev):
            try:
                with open(prev) as fh:
                    ver = int(_json.load(fh).get("version", 0))
            except (ValueError, OSError, KeyError):
                ver = 0
        self.version = ver + 1

    def write(self, iterator) -> _FileCommit:
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        rows = [r.asDict() for r in iterator]
        staging = _os.path.join(self.path, "_staging")
        _os.makedirs(staging, exist_ok=True)
        fname = _os.path.join(
            staging, f"part-v{self.version:04d}-{pid:05d}.parquet"
        )
        cols = {}
        if rows:
            for k in rows[0]:
                cols[k] = [r[k] for r in rows]
        pq.write_table(pa.table(cols) if cols else pa.table({}), fname)
        return _FileCommit(path=fname, n_rows=len(rows))

    def commit(self, messages) -> None:
        import shutil as _shutil

        # Publish order (crash-safe at every boundary): (1) move the new
        # versioned parts into place — their names collide with nothing the
        # live manifest references, so the old dataset stays fully readable;
        # (2) atomically swap in the new manifest.json — THE commit point;
        # (3) only then delete parts the new manifest doesn't list. A crash
        # before (2) leaves the old manifest + all its files intact (new
        # parts are unreferenced debris, removed by the next successful
        # write's step 3); a crash after (2) leaves a valid new dataset
        # with stale-part debris that manifest-readers never consult.
        final = []
        for m in messages:
            if m is None or m.n_rows == 0:
                continue
            dest = _os.path.join(self.path, _os.path.basename(m.path))
            _os.replace(m.path, dest)
            final.append({"file": _os.path.basename(dest), "n_rows": m.n_rows})
        manifest = {
            "version": self.version,
            "files": sorted(final, key=lambda f: f["file"]),
            "total_rows": sum(f["n_rows"] for f in final),
        }
        tmp = _os.path.join(self.path, "manifest.json.tmp")
        with open(tmp, "w") as fh:
            _json.dump(manifest, fh)
        _os.replace(tmp, _os.path.join(self.path, "manifest.json"))
        # mode("overwrite"): this write REPLACES the dataset — drop any
        # part files from previous writes (and this write's own debris,
        # e.g. abandoned earlier versions) so a directory-listing reader
        # never sees old and new data mixed beside the fresh manifest.
        if self.overwrite:
            keep = {f["file"] for f in final}
            for f in _os.listdir(self.path):
                if f.startswith("part-") and f not in keep:
                    _os.remove(_os.path.join(self.path, f))
        # zero-row staged files (and the staging dir itself) are debris
        # once the manifest is durable.
        _shutil.rmtree(_os.path.join(self.path, "_staging"),
                       ignore_errors=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class ManifestSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_sink"

    def writer(self, schema, overwrite: bool):
        return ManifestSinkWriter(self.options, overwrite)


def register_sink(spark) -> None:
    spark.dataSource.register(ManifestSinkDataSource)
