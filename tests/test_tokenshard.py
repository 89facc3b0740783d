"""Packed token-shard sink/source (Python DataSource write path):
roundtrip through Spark, binary layout verified against the on-disk
contract byte for byte, commit manifest totals, overwrite semantics."""

from __future__ import annotations

import json
import os
import struct

from pyspark.sql import functions as F

from udacitycapstonedataengineer_spark.sources.readers import load_table
from udacitycapstonedataengineer_spark.sources.tokenshard import (
    register_tokenshard_datasource,
)


def _token_df(spark, sf_dir):
    # deterministic fake token ids from the document text (the
    # container has no tokenizer libs; the layout is what's under test)
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("seq_id"),
        F.expr(
            "transform(split(lower(text), '\\\\s+'),"
            " t -> CAST(pmod(hash(t), 50257) AS INT))"
        ).alias("token_ids"),
    )


def test_tokenshard_roundtrip_layout_and_manifest(spark, sf_dir, tmp_path):
    register_tokenshard_datasource(spark)
    out = str(tmp_path / "shards")
    df = _token_df(spark, sf_dir).repartition(3, "seq_id")
    df.write.format("tokenshard").mode("overwrite").save(out)

    # manifest is the commit finish line and carries exact totals
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    want_seqs = df.count()
    want_tokens = df.select(F.sum(F.size("token_ids"))).collect()[0][0]
    assert manifest["n_seqs"] == want_seqs
    assert manifest["n_tokens"] == want_tokens
    assert len(manifest["shards"]) == 3

    # Spark roundtrip: read side reconstructs every sequence exactly
    back = spark.read.format("tokenshard").load(out)
    a = {r.seq_id: list(r.token_ids) for r in back.collect()}
    b = {r.seq_id: list(r.token_ids) for r in df.collect()}
    assert a == b

    # binary contract: decode one shard with plain struct/file IO —
    # a data loader must not need Spark (or this repo) to mmap shards
    shard = manifest["shards"][0]["shard"]
    with open(os.path.join(out, shard + ".idx"), "rb") as f:
        recs = list(struct.Struct("<qqq").iter_unpack(f.read()))
    with open(os.path.join(out, shard + ".bin"), "rb") as f:
        blob = f.read()
    assert recs, "first shard unexpectedly empty"
    running = 0
    for seq_id, off, n in recs:
        assert off == running  # contiguous packing
        toks = list(
            struct.unpack_from(f"<{n}i", blob, off * 4)
        )
        assert toks == b[seq_id]
        running += n
    assert running * 4 == len(blob)


def test_tokenshard_no_clobber_without_overwrite(spark, sf_dir, tmp_path):
    import pytest

    register_tokenshard_datasource(spark)
    out = str(tmp_path / "shards2")
    df = _token_df(spark, sf_dir).limit(10).repartition(1)
    df.write.format("tokenshard").mode("overwrite").save(out)
    with pytest.raises(Exception, match="already contains shards"):
        df.write.format("tokenshard").mode("append").save(out)
    # and the original data survived the refused write
    assert spark.read.format("tokenshard").load(out).count() == 10


def test_pack_corpus_end_to_end(spark, sf_dir, tmp_path):
    """raw docs → quality/lang/dedup chain → packed shards: the
    committed manifest totals must equal the prepared corpus's chunk
    count and summed token counts, and the shards must read back."""
    from udacitycapstonedataengineer_spark.plans.corpus import (
        pack_corpus_to_shards,
        prepare_corpus,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "corpus_shards")
    metrics = pack_corpus_to_shards(spark, docs, out, shards=2)
    assert metrics["packed_seqs"] == metrics["chunks"] > 0
    chunks, _ = prepare_corpus(docs)
    want_tokens = chunks.select(
        F.sum(
            F.size(F.filter(F.split(F.lower("chunk"), r"\s+"), lambda t: t != ""))
        )
    ).collect()[0][0]
    assert metrics["packed_tokens"] == want_tokens
    back = spark.read.format("tokenshard").load(out)
    assert back.count() == metrics["chunks"]


def test_tokenshard_rollover_splits_at_budget(spark, sf_dir, tmp_path):
    """maxTokensPerShard rolls a partition over to new shard pairs
    before the budget is exceeded; totals still reconcile and every
    sequence reads back intact."""
    register_tokenshard_datasource(spark)
    out = str(tmp_path / "shards_roll")
    df = _token_df(spark, sf_dir).repartition(2, "seq_id")
    df.write.format("tokenshard").mode("overwrite").option(
        "maxTokensPerShard", 5000
    ).save(out)
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    assert len(manifest["shards"]) > 2, "budget produced no rollover"
    assert all(s["n_tokens"] <= 5000 for s in manifest["shards"])
    assert manifest["n_seqs"] == df.count()
    assert (
        manifest["n_tokens"]
        == df.select(F.sum(F.size("token_ids"))).collect()[0][0]
    )
    back = spark.read.format("tokenshard").load(out)
    a = {r.seq_id: list(r.token_ids) for r in back.collect()}
    b = {r.seq_id: list(r.token_ids) for r in df.collect()}
    assert a == b
    # no attempt temps survive a committed write
    assert not [p for p in os.listdir(out) if p.endswith(".tmp")]


def test_tokenshard_sequence_larger_than_budget_fails_loudly(
    spark, sf_dir, tmp_path
):
    import pytest

    register_tokenshard_datasource(spark)
    out = str(tmp_path / "shards_toolong")
    df = _token_df(spark, sf_dir).limit(5).repartition(1)
    with pytest.raises(Exception, match="never span shards"):
        df.write.format("tokenshard").mode("overwrite").option(
            "maxTokensPerShard", 3
        ).save(out)


def test_tokenshard_overwrite_is_commit_swapped(spark, sf_dir, tmp_path):
    """Overwriting with a narrower write removes the stale shards of
    the previous write only at commit time, and the manifest matches
    the surviving shard set exactly."""
    register_tokenshard_datasource(spark)
    out = str(tmp_path / "shards_swap")
    df = _token_df(spark, sf_dir)
    df.repartition(4, "seq_id").write.format("tokenshard").mode(
        "overwrite"
    ).save(out)
    assert len(glob_shards(out)) == 8  # 4 pairs
    df.limit(20).repartition(1).write.format("tokenshard").mode(
        "overwrite"
    ).save(out)
    with open(os.path.join(out, "manifest.json")) as f:
        manifest = json.load(f)
    names = {s["shard"] for s in manifest["shards"]}
    on_disk = glob_shards(out)
    assert {p.rsplit(".", 1)[0] for p in on_disk} == names
    assert spark.read.format("tokenshard").load(out).count() == 20


def glob_shards(out):
    return [
        p
        for p in os.listdir(out)
        if p.startswith("shard-") and not p.endswith(".tmp")
    ]


def test_tokenshard_streaming_runs_as_microbatches(spark, sf_dir, tmp_path):
    """Streaming surface: the landing dir's committed RUNS become
    micro-batches (manifest = commit line); an uncommitted run is
    invisible; a restart from the checkpoint consumes only new runs."""
    register_tokenshard_datasource(spark)
    landing = tmp_path / "landing"
    landing.mkdir()
    df = _token_df(spark, sf_dir)
    run1 = df.filter(F.col("seq_id") % 2 == 0)
    run2 = df.filter(F.col("seq_id") % 2 == 1)
    run1.write.format("tokenshard").mode("overwrite").save(
        str(landing / "run-000")
    )
    # an in-flight (uncommitted) run: shards but no manifest yet
    inflight = landing / "run-001"
    inflight.mkdir()
    (inflight / "shard-00000-000.bin").write_bytes(b"\x00\x00\x00\x00")

    ckpt = str(tmp_path / "ckpt")
    out1 = str(tmp_path / "out1")

    def drain(out_dir):
        q = (
            spark.readStream.format("tokenshard")
            .load(str(landing))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain(out1)
    got1 = {
        r["seq_id"]: list(r["token_ids"])
        for r in spark.read.parquet(out1).collect()
    }
    want1 = {
        r["seq_id"]: list(r["token_ids"]) for r in run1.collect()
    }
    assert got1 == want1  # run-000 only; in-flight run-001 invisible

    # commit run-002; restart from the same checkpoint
    run2.write.format("tokenshard").mode("overwrite").save(
        str(landing / "run-002")
    )
    drain(out1)
    got2 = {
        r["seq_id"]: list(r["token_ids"])
        for r in spark.read.parquet(out1).collect()
    }
    want2 = dict(want1)
    want2.update(
        {r["seq_id"]: list(r["token_ids"]) for r in run2.collect()}
    )
    assert got2 == want2  # run-002 appended exactly once, no replays
