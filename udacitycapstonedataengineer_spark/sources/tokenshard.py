"""Packed token-shard sink/source via the Python DataSource API
(Spark 4) — the training-corpus interchange layout.

The reference's only sink is parquet (etl.py:84-85); a pre-training
pipeline's LAST hop is different: fixed-layout binary shards of
packed token ids that a data loader can mmap and randomly index
without any decode (the role of Megatron-style .bin/.idx files).
This module implements that hop natively in Spark — completing the
engine's Python DataSource surface with the WRITE side (the SAS
reader in sas_datasource.py is the read side).

Layout (all little-endian, one or more shard pairs per Spark
partition):

- ``shard-NNNNN-KKK.bin`` — a slice of the partition's token ids
  concatenated, int32 (``NNNNN`` = partition id, ``KKK`` = rollover
  index within the partition)
- ``shard-NNNNN-KKK.idx`` — one (seq_id: int64, offset: int64,
  n_tokens: int64) triple per sequence; ``offset`` indexes TOKENS
  (not bytes) into the shard's .bin
- ``manifest.json`` — written on driver COMMIT (atomic finish line):
  shard list + per-shard and total sequence/token counts. Readers
  treat a directory without a manifest as an aborted write.

Committer protocol (mirrors the Hadoop/parquet pattern): each task
ATTEMPT writes to attempt-unique temp names
(``shard-NNNNN-KKK.bin.<attemptId>.tmp``), so a retried or
speculative second attempt of the same partition never interleaves
bytes with a still-running first attempt. The driver's ``commit()``
renames only the WINNING attempts' files into place, removes stale
shards from a previous write (overwrite is commit-swapped, not
destructive-first: an overwrite job that dies mid-write leaves the
old shard set and manifest fully intact), sweeps losing-attempt
temps, and finally replaces ``manifest.json`` atomically. ``abort()``
sweeps all temp files and leaves any previous committed write
untouched.

Shard rollover: ``maxTokensPerShard`` (default and hard cap
2^31 - 1 — the read side materializes a shard as one Arrow int32
list array, whose offsets overflow past 2^31 tokens / 8 GB .bin)
rolls a partition over to a new shard pair before the budget is
exceeded, so a 100-TB pack job bounds shard size by option rather
than by partition-count tuning. A single sequence longer than the
budget fails loudly — sequences never span shards.

Scale notes: each task writes only its own partition's pairs —
sequential appends, no shuffle, no driver data movement; the commit
message carries names and counts only. Random access needs no token
offsets table in memory beyond the O(#sequences) idx. Writes land on
the task's local view of the target path (local disk / NFS / fuse
mount in this sandbox); an object-store deployment would wrap the
same layout in the cloud committer pattern session.py documents for
parquet.

Usage::

    register_tokenshard_datasource(spark)
    df.write.format("tokenshard").mode("overwrite").save("/shards/run1")
    back = spark.read.format("tokenshard").load("/shards/run1")
"""

from __future__ import annotations

import glob
import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_IDX_REC = struct.Struct("<qqq")  # seq_id, token offset, n_tokens
_SCHEMA = "seq_id bigint, token_ids array<int>"
_MAX_TOKENS_PER_SHARD = 0x7FFFFFFF  # Arrow int32 list-offset bound


@dataclass
class _ShardCommit(WriterCommitMessage):
    # one winning attempt's shards: [{"shard", "n_seqs", "n_tokens"}]
    shards: list
    attempt: int


@dataclass
class _ShardPartition(InputPartition):
    bin_path: str
    idx_path: str


class TokenShardDataSource(DataSource):
    """``format("tokenshard")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "tokenshard"

    def schema(self) -> str:
        return _SCHEMA

    def writer(self, schema, overwrite: bool):
        if [f.name for f in schema.fields] != ["seq_id", "token_ids"]:
            raise ValueError(
                "tokenshard expects columns (seq_id bigint, token_ids "
                f"array<int>), got {schema.simpleString()}"
            )
        budget = int(
            self.options.get("maxtokenspershard", _MAX_TOKENS_PER_SHARD)
        )
        return _TokenShardWriter(self.options["path"], overwrite, budget)

    def reader(self, schema):
        return _TokenShardReader(self.options["path"])

    def streamReader(self, schema):
        # streaming surface: the path is a LANDING DIRECTORY whose
        # children are committed tokenshard RUN directories (the batch
        # reader's unit); each newly committed run becomes one
        # micro-batch. See _TokenShardStreamReader.
        return _TokenShardStreamReader(self.options["path"])


class _TokenShardWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool, budget: int) -> None:
        self.path = path
        if not 0 < budget <= _MAX_TOKENS_PER_SHARD:
            raise ValueError(
                "tokenshard: maxTokensPerShard must be in "
                f"(0, 2^31 - 1], got {budget}"
            )
        self.budget = budget
        # driver-side: check for conflicts before tasks launch, but
        # DELETE nothing yet — overwrite is commit-swapped in
        # commit(), so a failed overwrite job leaves the previous
        # write intact.
        os.makedirs(path, exist_ok=True)
        if not overwrite and (
            glob.glob(os.path.join(path, "shard-*"))
            or os.path.exists(os.path.join(path, "manifest.json"))
        ):
            raise FileExistsError(
                f"tokenshard: {path} already contains shards; "
                "use mode('overwrite')"
            )

    def write(self, iterator) -> _ShardCommit:
        from array import array

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.taskAttemptId()
        shards, k = [], 0
        fb = fi = None
        n_seqs = n_tokens = 0

        def _open_pair(k):
            shard = f"shard-{pid:05d}-{k:03d}"
            fb = open(
                os.path.join(self.path, f"{shard}.bin.{attempt}.tmp"), "wb"
            )
            fi = open(
                os.path.join(self.path, f"{shard}.idx.{attempt}.tmp"), "wb"
            )
            return shard, fb, fi

        def _close_pair():
            fb.close()
            fi.close()
            shards.append(
                {"shard": shard, "n_seqs": n_seqs, "n_tokens": n_tokens}
            )

        shard, fb, fi = _open_pair(k)
        try:
            for row in iterator:
                toks = array("i", row.token_ids or [])
                if len(toks) > self.budget:
                    raise ValueError(
                        f"tokenshard: sequence {row.seq_id} has "
                        f"{len(toks)} tokens, more than maxTokensPerShard="
                        f"{self.budget}; sequences never span shards"
                    )
                if n_tokens + len(toks) > self.budget and n_seqs > 0:
                    # roll over BEFORE the budget is exceeded
                    _close_pair()
                    k += 1
                    n_seqs = n_tokens = 0
                    shard, fb, fi = _open_pair(k)
                fi.write(_IDX_REC.pack(row.seq_id, n_tokens, len(toks)))
                toks.tofile(fb)
                n_seqs += 1
                n_tokens += len(toks)
        except BaseException:
            fb.close()
            fi.close()
            raise
        _close_pair()
        return _ShardCommit(shards=shards, attempt=attempt)

    def _sweep_temps(self) -> None:
        for p in glob.glob(os.path.join(self.path, "shard-*.tmp")):
            try:
                os.remove(p)
            except OSError:
                pass

    def commit(self, messages) -> None:
        shards = []
        # rename only the WINNING attempts' temp files into place
        for m in messages:
            if m is None:
                continue
            for s in m.shards:
                for ext in (".bin", ".idx"):
                    os.replace(
                        os.path.join(
                            self.path, f"{s['shard']}{ext}.{m.attempt}.tmp"
                        ),
                        os.path.join(self.path, s["shard"] + ext),
                    )
                shards.append(s)
        shards.sort(key=lambda s: s["shard"])
        # commit-swap: drop previous-write shards not re-used by this
        # write, then losing-attempt temps, then publish the manifest
        keep = {s["shard"] + ext for s in shards for ext in (".bin", ".idx")}
        for p in glob.glob(os.path.join(self.path, "shard-*")):
            name = os.path.basename(p)
            if name not in keep and not name.endswith(".tmp"):
                os.remove(p)
        self._sweep_temps()
        manifest = {
            "format": "tokenshard-v1",
            "dtype": "int32",
            "shards": shards,
            "n_seqs": sum(s["n_seqs"] for s in shards),
            "n_tokens": sum(s["n_tokens"] for s in shards),
        }
        tmp = os.path.join(self.path, ".manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, os.path.join(self.path, "manifest.json"))

    def abort(self, messages) -> None:
        # sweep ALL attempt temps (including failed attempts that
        # never returned a commit message); committed files from a
        # previous write are never touched
        self._sweep_temps()


class _TokenShardReader(DataSourceReader):
    def __init__(self, path: str) -> None:
        self.path = path
        manifest_path = os.path.join(path, "manifest.json")
        if not os.path.exists(manifest_path):
            raise FileNotFoundError(
                f"tokenshard: no manifest.json in {path} "
                "(missing or aborted write)"
            )
        with open(manifest_path) as f:
            self.manifest = json.load(f)

    def partitions(self):
        return [
            _ShardPartition(
                bin_path=os.path.join(self.path, s["shard"] + ".bin"),
                idx_path=os.path.join(self.path, s["shard"] + ".idx"),
            )
            for s in self.manifest["shards"]
        ]

    def read(self, partition):
        import pyarrow as pa

        with open(partition.idx_path, "rb") as f:
            idx_raw = f.read()
        with open(partition.bin_path, "rb") as f:
            buf = f.read()
        tokens = pa.Array.from_buffers(
            pa.int32(), len(buf) // 4, [None, pa.py_buffer(buf)]
        )
        seq_ids, offsets = [], [0]
        for rec in _IDX_REC.iter_unpack(idx_raw):
            seq_id, off, n = rec
            seq_ids.append(seq_id)
            offsets.append(off + n)
        list_arr = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()), tokens
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array(seq_ids, pa.int64()), list_arr],
            ["seq_id", "token_ids"],
        )


class _TokenShardStreamReader(DataSourceStreamReader):
    """Streaming read over a landing directory of tokenshard runs —
    the trainer-side consumption pattern: the packing pipeline COMMITS
    whole runs (manifest.json is the atomic finish line), the stream
    picks each newly committed run up as one micro-batch of packed
    sequences.

    Contract: run directory names must be monotonically increasing in
    lexicographic order (run-000123, 2026-08-14T12-00-00, …) — the
    universal landing convention — because the offset is simply the
    last consumed run name ({"last": name}). A run directory WITHOUT a
    manifest is in-flight or aborted and is never read; since names
    are monotonic and latestOffset only advances over a committed
    prefix, a straggler commit below an already-consumed name is
    surfaced as an error rather than silently skipped.

    Scale: offsets are O(1) strings; each micro-batch plans one input
    partition per shard (the same partition granularity as the batch
    reader), so a run with thousands of shards fans out across the
    cluster; nothing is read on the driver beyond manifests.
    """

    def __init__(self, path: str) -> None:
        self.path = path

    def _committed_runs(self) -> list[str]:
        runs = []
        for p in sorted(glob.glob(os.path.join(self.path, "*"))):
            if os.path.isdir(p) and os.path.exists(
                os.path.join(p, "manifest.json")
            ):
                runs.append(os.path.basename(p))
        return runs

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        runs = self._committed_runs()
        return {"last": runs[-1] if runs else ""}

    def partitions(self, start: dict, end: dict):
        parts: list[_ShardPartition] = []
        for run in self._committed_runs():
            if start["last"] < run <= end["last"]:
                run_dir = os.path.join(self.path, run)
                with open(os.path.join(run_dir, "manifest.json")) as f:
                    manifest = json.load(f)
                for s in manifest["shards"]:
                    parts.append(
                        _ShardPartition(
                            bin_path=os.path.join(
                                run_dir, s["shard"] + ".bin"
                            ),
                            idx_path=os.path.join(
                                run_dir, s["shard"] + ".idx"
                            ),
                        )
                    )
        return parts

    def read(self, partition):
        # identical shard decode as the batch reader
        yield from _TokenShardReader.read(self, partition)

    def commit(self, end: dict) -> None:
        # source-side retention (deleting consumed runs) is the
        # pipeline's policy, not the reader's — nothing to do
        pass


def register_tokenshard_datasource(spark) -> None:
    spark.dataSource.register(TokenShardDataSource)
