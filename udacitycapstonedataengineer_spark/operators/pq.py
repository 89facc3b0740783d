"""Product quantization (PQ) — compressed ANN at 100-TB vector scale.

Brute-force and IVF top-k (operators/similarity.py) keep full float
vectors; at 10^10+ vectors the index must shrink. PQ splits each
d-dim vector into ``m`` subvectors, k-means-quantizes each subspace
to ``k`` centroids, and stores only the m byte-sized codes — a
64-dim float32 vector becomes 8 bytes (32× compression), and query
scoring needs no decompression: the query's distance to every
centroid of every subspace is a tiny (m×k) lookup table, and the
asymmetric distance (ADC) of a database vector is the sum of m table
entries selected by its codes (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011).

Everything follows the repo's determinism discipline
(operators/clustering.py): no RNG (seeds = first k vectors by id),
fixed-point BIGINT centroid accumulation (partition-order-free),
explicit argmin tie-breaks. The novel Spark shape here is GROUPED
k-means: all m subspaces train in the SAME jobs — per-row, all m
subspace argmins are computed MAP-SIDE against the collected
codebooks (model-sized: m·k×dsub), and the centroid update is one
(sub, cluster)-grain aggregate — so training cost is iterations × ONE
small-output shuffle regardless of m, not m separate k-means runs
(pre-r16 this paid a row_number-window Exchange over vec_id·m rows
plus a corpus-grain join-back per iteration — guide §2.4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import SCALE

_DIST2 = (
    "aggregate(zip_with({v}, {c}, (x, y) -> (x - y) * (x - y)),"
    " 0D, (acc, w) -> acc + w)"
)


def _subvectors(emb: DataFrame, m: int, vec_col: str) -> DataFrame:
    """(vec_id, sub, v): the m d/m-dim slices of each vector, as one
    exploded table so every subspace shares the same jobs."""
    slices = F.expr(
        f"transform(sequence(0, {m} - 1), i -> struct(i AS sub, "
        f"transform(slice({vec_col}, i * (size({vec_col}) div {m}) + 1, "
        f"size({vec_col}) div {m}), x -> cast(x as double)) AS v))"
    )
    return emb.select("vec_id", F.explode(slices).alias("s")).select(
        "vec_id", F.col("s.sub").alias("sub"), F.col("s.v").alias("v")
    )


def _books_by_sub(codebook_rows: list, m: int) -> dict[int, list]:
    """{sub: rows sorted by cid} from collected codebook rows, with
    the same missing-subspace validation the streaming twin performs."""
    by_sub: dict[int, list] = {}
    for r in codebook_rows:
        by_sub.setdefault(int(r["sub"]), []).append(r)
    missing = [s for s in range(m) if s not in by_sub]
    if missing:
        raise ValueError(
            f"pq: codebook missing subspaces {missing} (expected 0..{m - 1})"
        )
    return {s: sorted(rs, key=lambda r: int(r["cid"])) for s, rs in by_sub.items()}


def _sub_slice(vec_col: str, s: int, m: int) -> str:
    """SQL slice of subspace ``s`` — size-derived exactly like
    ``_subvectors`` so the two shapes stay byte-compatible."""
    d = f"(size({vec_col}) div {m})"
    return f"slice({vec_col}, {s} * {d} + 1, {d})"


def _sub_argmin_sql(vec_sql: str, book_rows: list) -> str:
    """array_min over (dist2, cid) structs for ONE subspace's codebook
    — the same sequential _DIST2 fold and (dist2, cid) tie-break the
    historical row_number window used, as a map-only expression (the
    ``stream_ivfpq_encode`` shape, now the batch primitive too)."""
    entries = []
    for r in book_rows:
        c = "array(" + ",".join(f"{float(x)!r}D" for x in r["c"]) + ")"
        d2 = _DIST2.format(v=vec_sql, c=c)
        entries.append(f"struct({d2} AS dist2, {int(r['cid'])} AS cid)")
    return f"array_min(array({','.join(entries)})).cid"


def pq_codes_expr(codebook_rows: list, m: int, vec_col: str):
    """array<int> codes expression over a double-array column: per
    subspace, the nearest codeword id by the sequential squared-L2
    fold with the (dist2, cid) tie-break — one whole-stage-codegen
    projection, m·k literal structs, zero shuffle."""
    by_sub = _books_by_sub(codebook_rows, m)
    per_sub = [
        _sub_argmin_sql(_sub_slice(vec_col, s, m), by_sub[s])
        for s in range(m)
    ]
    return F.expr(f"array({','.join(per_sub)})")


def pq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """Train the m codebooks; returns (sub, cid, c array<double>).
    Seeds = slices of the first k vectors by vec_id; ``iters`` Lloyd
    iterations with fixed-point updates. All subspaces train in the
    same jobs (grouped k-means — see module docstring)."""
    spark = emb.sparkSession
    # seeds: the m subspace slices of the first k vectors by vec_id —
    # the same values _subvectors produced, fetched with ONE limit-k
    # job instead of a distinct + self-join over the exploded table
    seed_rows = _subvectors(
        emb.orderBy("vec_id").limit(k), m, vec_col
    ).orderBy("vec_id", "sub").collect()
    n_seed_vecs = len({r["vec_id"] for r in seed_rows})
    if n_seed_vecs < k:
        raise ValueError(f"pq_train: k={k} but only {n_seed_vecs} vectors")
    seed_ids = sorted({r["vec_id"] for r in seed_rows})
    cid_of = {vid: i for i, vid in enumerate(seed_ids)}
    from .clustering import quantize_vec_py

    # driver-side seed quantization (bit-identical — quantize_vec_py):
    # the model starts as plain rows, no local-relation action spent
    book_rows = [
        {
            "sub": int(r["sub"]),
            "cid": cid_of[r["vec_id"]],
            "c": quantize_vec_py(r["v"]),
        }
        for r in seed_rows
    ]
    dsub = len(seed_rows[0]["v"])
    v = emb.select(
        "vec_id",
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    )
    for _ in range(iters - 1):
        # map-only assignment against the collected model (the
        # stream_ivfpq_encode shape): per row, all m subspace argmins
        # in one projection, exploded map-side to (sub, cluster, sv)
        # — the window Exchange over vec_id·m rows and the corpus-
        # grain join-back are gone (guide §2.4); the only shuffle per
        # iteration is the (sub, cluster)-group partial aggregation.
        by_sub = _books_by_sub(book_rows, m)
        slices = F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.expr(
                        _sub_argmin_sql(_sub_slice("v", s, m), by_sub[s])
                    ).alias("cluster"),
                    F.expr(_sub_slice("v", s, m)).alias("sv"),
                )
                for s in range(m)
            ]
        )
        exploded = v.select(F.explode(slices).alias("s")).select(
            F.col("s.sub").alias("sub"),
            F.col("s.cluster").alias("cluster"),
            F.col("s.sv").alias("sv"),
        )
        sums = (
            exploded.groupBy("sub", "cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(F.element_at("sv", i) * SCALE).cast("long")
                    ).alias(f"s{i}")
                    for i in range(1, dsub + 1)
                ],
            )
            .collect()
        )
        # truncating update finished driver-side, op for op the former
        # SQL select: (s / n) double division, CAST AS BIGINT (trunc
        # toward zero — Python int() matches), back to double / SCALE;
        # empty clusters keep their previous centroid (kept-merge)
        new_rows = [
            {
                "sub": int(r["sub"]),
                "cid": int(r["cluster"]),
                "c": [
                    float(int(float(r[f"s{i}"]) / float(r["n"]))) / SCALE
                    for i in range(1, dsub + 1)
                ],
            }
            for r in sums
        ]
        new_keys = {(r["sub"], r["cid"]) for r in new_rows}
        book_rows = sorted(
            new_rows
            + [
                r
                for r in book_rows
                if (r["sub"], r["cid"]) not in new_keys
            ],
            key=lambda r: (r["sub"], r["cid"]),
        )
    # the final model is plain rows; the returned DataFrame is a cheap
    # local relation carrying them (model_rows readers skip the
    # re-collect)
    out = spark.createDataFrame(
        [(r["sub"], r["cid"], list(r["c"])) for r in book_rows],
        "sub int, cid int, c array<double>",
    )
    out._graft_rows = book_rows
    return out


def pq_encode(
    emb: DataFrame, codebooks: DataFrame, m: int, vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, codes array<int>): each vector's per-subspace nearest
    centroid ids, in subspace order — the 1-byte-per-subspace
    compressed representation.

    Map-only (guide §2.4): the codebooks are the MODEL (m·k rows), so
    they are collected once and every vector's m codes come out of one
    codegen'd projection — the previous shape exploded m rows per
    vector through a row_number-window Exchange and re-grouped them
    with a second Exchange. ``codebooks`` may be a DataFrame or
    pre-collected rows. Decision-identical fold and (dist2, cid)
    tie-break (the ``stream_ivfpq_encode`` expression, which
    ``test_stream_ivfpq_encode_matches_batch`` pins against this)."""
    from .clustering import model_rows

    rows = model_rows(codebooks)
    return emb.select(
        "vec_id",
        F.expr(f"transform({vec_col}, x -> cast(x as double))").alias("v"),
    ).select("vec_id", pq_codes_expr(rows, m, "v").alias("codes"))


def pq_adc_topk(
    codes: DataFrame, codebooks: DataFrame, query: list[float], topk: int = 10
) -> DataFrame:
    """Asymmetric-distance top-k: the query is NOT quantized; its
    distance to every (sub, centroid) pair forms an m×k lookup table
    (driver numpy — m·k·(d/m) = d·k flops), and each database vector
    scores as the sum of m table entries picked by its codes — one
    native aggregate over the broadcast flat table, no vector data
    touched. Returns (vec_id, adc_dist2) smallest-first with vec_id
    tie-break."""
    from .clustering import model_rows

    cb = model_rows(codebooks)
    m = max(r["sub"] for r in cb) + 1
    k = max(r["cid"] for r in cb) + 1
    dsub = len(cb[0]["c"])
    q = np.asarray(query, dtype=np.float64)
    lut = np.full((m, k), np.inf)
    for r in cb:
        qs = q[r["sub"] * dsub : (r["sub"] + 1) * dsub]
        # SEQUENTIAL fold (Python doubles), not numpy .sum(): numpy's
        # pairwise summation tree differs in the last ulp, and these
        # LUT entries must be bit-identical to the sequential
        # zip_with/list_inner_product fold the DuckDB oracle twin
        # replays (ivfpq_oracle_sql) — the same cross-engine float
        # discipline as operators/clustering.py.
        d2 = 0.0
        for a, b in zip(qs, r["c"]):
            d2 += (float(a) - float(b)) * (float(a) - float(b))
        lut[r["sub"], r["cid"]] = d2
    flat = F.array(*[F.lit(float(x)) for x in lut.reshape(-1)])
    # element_at is 1-based in Spark SQL: sub s's code is
    # element_at(codes, s+1); its LUT slot is s*k + code (0-based)
    dist = F.expr(
        f"aggregate(sequence(0, {m} - 1), 0D, (acc, s) -> "
        f"acc + element_at(__lut, s * {k} + element_at(codes, s + 1) + 1))"
    )
    return (
        codes.withColumn("__lut", flat)
        .select("vec_id", dist.alias("adc_dist2"))
        .orderBy("adc_dist2", "vec_id")
        .limit(topk)
    )
