"""Packed token-shard sink/source via the Python DataSource API
(Spark 4) — the training-corpus interchange layout.

The reference's only sink is parquet (etl.py:84-85); a pre-training
pipeline's LAST hop is different: fixed-layout binary shards of
packed token ids that a data loader can mmap and randomly index
without any decode (the role of Megatron-style .bin/.idx files).
This module implements that hop natively in Spark — completing the
engine's Python DataSource surface with the WRITE side (the SAS
reader in sas_datasource.py is the read side).

Layout (all little-endian, one shard pair per Spark partition):

- ``shard-NNNNN.bin`` — the partition's token ids concatenated, int32
- ``shard-NNNNN.idx`` — one (seq_id: int64, offset: int64,
  n_tokens: int64) triple per sequence; ``offset`` indexes TOKENS
  (not bytes) into the shard's .bin
- ``manifest.json`` — written on driver COMMIT (atomic finish line):
  shard list + per-shard and total sequence/token counts. Readers
  treat a directory without a manifest as an aborted write.

Scale notes: each task writes only its own partition's pair —
sequential appends, no shuffle, no driver data movement; the commit
message carries counts only. Random access needs no token offsets
table in memory beyond the O(#sequences) idx. Writes land on the
task's local view of the target path (local disk / NFS / fuse mount
in this sandbox); an object-store deployment would wrap the same
layout in the cloud committer pattern session.py documents for
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
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

_IDX_REC = struct.Struct("<qqq")  # seq_id, token offset, n_tokens
_SCHEMA = "seq_id bigint, token_ids array<int>"


@dataclass
class _ShardCommit(WriterCommitMessage):
    shard: str
    n_seqs: int
    n_tokens: int


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
        return _TokenShardWriter(self.options["path"], overwrite)

    def reader(self, schema):
        return _TokenShardReader(self.options["path"])


class _TokenShardWriter(DataSourceWriter):
    def __init__(self, path: str, overwrite: bool) -> None:
        self.path = path
        # driver-side: prepare the directory before tasks launch
        os.makedirs(path, exist_ok=True)
        stale = glob.glob(os.path.join(path, "shard-*")) + glob.glob(
            os.path.join(path, "manifest.json")
        )
        if stale and not overwrite:
            raise FileExistsError(
                f"tokenshard: {path} already contains shards; "
                "use mode('overwrite')"
            )
        for f in stale:
            os.remove(f)

    def write(self, iterator) -> _ShardCommit:
        from array import array

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        shard = f"shard-{pid:05d}"
        bin_path = os.path.join(self.path, shard + ".bin")
        idx_path = os.path.join(self.path, shard + ".idx")
        n_seqs = n_tokens = 0
        with open(bin_path, "wb") as fb, open(idx_path, "wb") as fi:
            for row in iterator:
                toks = array("i", row.token_ids or [])
                fi.write(_IDX_REC.pack(row.seq_id, n_tokens, len(toks)))
                toks.tofile(fb)
                n_seqs += 1
                n_tokens += len(toks)
                if n_tokens > 0x7FFFFFFF:
                    # the Arrow list offsets on the read side are
                    # int32; a shard past 2^31 tokens (8 GB .bin)
                    # would read back corrupted — fail the WRITE
                    # loudly instead. Repartition wider.
                    raise ValueError(
                        f"tokenshard: shard {shard} exceeds 2^31 tokens; "
                        "increase the partition count"
                    )
        return _ShardCommit(shard=shard, n_seqs=n_seqs, n_tokens=n_tokens)

    def commit(self, messages) -> None:
        shards = sorted(
            (
                {"shard": m.shard, "n_seqs": m.n_seqs, "n_tokens": m.n_tokens}
                for m in messages
                if m is not None
            ),
            key=lambda s: s["shard"],
        )
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
        for m in messages or []:
            if m is None:
                continue
            for ext in (".bin", ".idx"):
                p = os.path.join(self.path, m.shard + ext)
                if os.path.exists(p):
                    os.remove(p)


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


def register_tokenshard_datasource(spark) -> None:
    spark.dataSource.register(TokenShardDataSource)
