"""NPZ as a first-class Spark data source (Python Data Source API,
Spark 4): ``spark.read.format("npz").load(path)`` for batch and
``spark.readStream.format("npz")`` for a file-feed stream — the modern
form of the binaryFile+mapInPandas migration path in ``npz.py``
(SURVEY §2.1 S2/S3; the reference reads keyed NPZ archives,
``train_classification.py:171-177``).

Planner-visible partitioning: one input partition per (archive, array
key), so a 9-array dump decodes on 9 cores without any repartition —
the DSv2 contract the mapInPandas path cannot express. Each partition
re-opens only its own archive lazily inside the executor; nothing
binary ships through the driver (the stream's driver-side offset work
is header/metadata only)."""

from __future__ import annotations

import glob as _glob

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)


class NpzKeyPartition(InputPartition):
    def __init__(self, path: str, key: str):
        self.path = path
        self.key = key


class NpzReader(DataSourceReader):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npz source requires a path")

    def partitions(self):
        import numpy as np

        parts = []
        for path in sorted(_glob.glob(self.path)):
            with np.load(path) as npz:  # metadata-only open: keys
                parts.extend(NpzKeyPartition(path, key) for key in npz.files)
        return parts

    def read(self, partition):
        return _read_partition_rows(partition)


def _read_partition_rows(partition: NpzKeyPartition):
    import numpy as np

    with np.load(partition.path) as npz:
        arr = np.atleast_2d(np.asarray(npz[partition.key], dtype="float64"))
    flat = arr.reshape(arr.shape[0], -1)
    for i in range(flat.shape[0]):
        yield (partition.path, partition.key, i, list(flat[i]))


class NpzStreamReader(DataSourceStreamReader):
    """Micro-batch reader over an NPZ drop directory: each trigger
    picks up archives not yet committed. The offset IS the sorted list
    of seen files — self-describing, so ``partitions(start, end)`` is a
    pure set difference with no driver-side state to rebuild on
    restart (the checkpoint replays offsets, the standard exactly-once
    file-feed contract). Executors decode; the driver touches only
    archive headers (key lists)."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npz source requires a path")

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        """Only archives that open cleanly enter the offset: a
        partially-copied file (the normal mid-copy state of a drop
        directory) is deferred to a later trigger instead of being
        committed into an offset range that would kill the query on
        every replay. Producers should still write-temp-then-rename —
        the header probe narrows the race, it cannot eliminate it."""
        ready = []
        for path in sorted(_glob.glob(self.path)):
            try:
                import numpy as np

                with np.load(path) as npz:
                    npz.files
                ready.append(path)
            except Exception:
                continue  # not fully written yet — retry next trigger
        return {"files": ready}

    def partitions(self, start: dict, end: dict):
        import numpy as np

        new_files = sorted(set(end["files"]) - set(start["files"]))
        parts = []
        for path in new_files:
            with np.load(path) as npz:  # header-only open
                parts.extend(NpzKeyPartition(path, key) for key in npz.files)
        # Spark requires ≥1 partition per batch; an empty batch reads
        # an empty partition list wrapped as no-op
        return parts or [NpzKeyPartition("", "")]

    def read(self, partition):
        if not partition.path:
            return iter(())
        return _read_partition_rows(partition)

    def commit(self, end: dict) -> None:
        pass


class NpzDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "npz"

    def schema(self) -> str:
        return "source_file string, key string, row_idx bigint, values array<double>"

    def reader(self, schema) -> DataSourceReader:
        return NpzReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return NpzStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> "NpzWriter":
        return NpzWriter(self.options, overwrite)


class NpzCommitMessage(WriterCommitMessage):
    """Executor→driver commit token: the temp shard this task wrote
    (None for an empty partition)."""

    def __init__(self, tmp_shard: str | None):
        self.tmp_shard = tmp_shard


class NpzWriter(DataSourceWriter):
    """Distributed NPZ sink (the write half of the S4 surface): each
    task groups its rows by ``key``, stacks them into 2-D float64
    arrays, and writes ONE temp shard archive; the driver-side
    ``commit`` publishes every shard with its final ``part-*.npz``
    name only after all tasks succeed, and ``abort`` removes the
    temps — the standard two-phase task-commit protocol, so readers
    (whose glob matches only ``part-*.npz``) never observe a partial
    write.  On a shared filesystem / object store the same protocol
    holds with a rename-capable committer."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("npz sink requires a path")
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        import numpy as np

        from high_energy_gamma_ray_search_in_kascade_array_data_spark.ml.inference import save_model_artifact

        by_key: dict[str, list] = {}
        for row in iterator:
            by_key.setdefault(row.key, []).append(
                np.asarray(row.values, dtype="float64")
            )
        if not by_key:
            return NpzCommitMessage(None)
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.npz")
        save_model_artifact(  # atomic temp+replace npz write, reused
            tmp, {k: np.stack(v) for k, v in sorted(by_key.items())}
        )
        return NpzCommitMessage(tmp)

    def commit(self, messages):
        import glob
        import os

        os.makedirs(self.path, exist_ok=True)
        existing = glob.glob(os.path.join(self.path, "part-*.npz"))
        if self.overwrite:
            for old in existing:
                os.remove(old)
            start = 0
        else:
            # Append mode: continue numbering after the max existing
            # shard index so a second save never clobbers the first
            # (ADVICE r4: part-00000 restart + os.replace silently
            # overwrote prior data).
            start = (
                max(
                    int(os.path.basename(p)[len("part-") : -len(".npz")])
                    for p in existing
                )
                + 1
                if existing
                else 0
            )
        shards = sorted(m.tmp_shard for m in messages if m and m.tmp_shard)
        for i, tmp in enumerate(shards, start=start):
            os.replace(tmp, os.path.join(self.path, f"part-{i:05d}.npz"))

    def abort(self, messages):
        import os

        for m in messages:
            if m and m.tmp_shard and os.path.exists(m.tmp_shard):
                os.remove(m.tmp_shard)
