"""IVF-PQ — the composed billion-scale ANN index (coarse inverted
lists × product-quantized residuals).

PQ alone (operators/pq.py) still scores EVERY vector's codes; IVF
alone (operators/similarity.py) prunes to a few coarse cells but keeps
full floats. The production index composes them (FAISS's IVFPQ): a
coarse k-means partitions vectors into ``nlist`` cells; each vector
stores its cell id plus the PQ codes of its RESIDUAL (vector − cell
centroid); a query probes only its ``nprobe`` nearest cells and scores
codes there with a PER-CELL ADC lookup table built from the query's
residual against that cell's centroid.

Composition here is deliberately thin: the coarse quantizer IS
``clustering.kmeans_assign`` and the residual codebooks ARE
``pq.pq_train`` on the residual table — the operators compose as
DataFrames, no new algorithmic machinery. Determinism carries
through (both components are RNG-free with fixed tie-breaks), so the
whole index build is bit-reproducible on any partitioning.

Scale shape: build = coarse k-means + one residual subtraction
(narrow) + grouped PQ training; query = nprobe·m·k lookup-table
flops on the driver, then a scan of ONLY the probed cells' code rows
(cell id is a join/filter key — on a cell-partitioned layout this is
partition pruning, nprobe/nlist of the data).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .clustering import kmeans_assign
from .pq import pq_adc_topk, pq_encode, pq_train


def ivfpq_build(
    emb: DataFrame,
    nlist: int = 8,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (coarse_centroids, codebooks, index):
    coarse_centroids = (cid, c array<double>); codebooks = PQ books
    over residuals (sub, cid, c); index = (vec_id, cell, codes)."""
    from .clustering import kmeans  # noqa: F401  (doc pointer)

    vectors = emb.select(
        "vec_id",
        F.expr(
            f"transform({vec_col}, x -> cast(x as double))"
        ).alias("v"),
    ).persist()
    # coarse quantizer: seeds + iterations exactly as clustering.kmeans
    seed = vectors.orderBy("vec_id").limit(nlist).collect()
    if len(seed) < nlist:
        raise ValueError(f"ivfpq_build: nlist={nlist} > {len(seed)} vectors")
    from .clustering import SCALE, _quantize_vec

    centroids = vectors.sparkSession.createDataFrame(
        [(i, r["v"]) for i, r in enumerate(seed)],
        "cid bigint, c array<double>",
    ).select("cid", F.expr(_quantize_vec("c")).alias("c"))
    dim = len(seed[0]["v"])
    for _ in range(iters - 1):
        assigned = kmeans_assign(vectors, centroids)
        sums = (
            vectors.join(assigned, "vec_id")
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(
                        F.floor(F.element_at("v", i) * SCALE).cast("long")
                    ).alias(f"s{i}")
                    for i in range(1, dim + 1)
                ],
            )
        )
        new = sums.select(
            F.col("cluster").alias("cid"),
            F.array(
                *[
                    (F.col(f"s{i}") / F.col("n")).cast("long").cast("double")
                    / SCALE
                    for i in range(1, dim + 1)
                ]
            ).alias("c"),
        )
        kept = centroids.join(new.select("cid"), "cid", "left_anti")
        centroids = new.unionByName(kept)
    centroids = centroids.persist()
    cells = kmeans_assign(vectors, centroids).withColumnRenamed(
        "cluster", "cell"
    )
    residuals = (
        vectors.join(cells, "vec_id")
        .join(
            F.broadcast(centroids.select(F.col("cid").alias("cell"), "c")),
            "cell",
        )
        .select(
            "vec_id",
            "cell",
            F.expr("zip_with(v, c, (x, y) -> x - y)").alias("embedding"),
        )
        .persist()
    )
    codebooks = pq_train(residuals, m=m, k=k, iters=iters).persist()
    index = residuals.select("vec_id", "cell").join(
        pq_encode(residuals, codebooks, m=m), "vec_id"
    )
    return centroids, codebooks, index


def ivfpq_topk(
    index: DataFrame,
    coarse_centroids: DataFrame,
    codebooks: DataFrame,
    query: list[float],
    nprobe: int = 2,
    topk: int = 10,
) -> DataFrame:
    """Probe the query's ``nprobe`` nearest cells and ADC-score only
    their code rows, each against a lookup table built from the
    query's residual in THAT cell. Smallest adc_dist2 first, vec_id
    tie-break."""
    q = np.asarray(query, dtype=np.float64)
    cents = {r["cid"]: np.asarray(r["c"]) for r in coarse_centroids.collect()}
    probed = sorted(
        cents, key=lambda cid: (((q - cents[cid]) ** 2).sum(), cid)
    )[:nprobe]
    per_cell = []
    for cell in probed:
        resid = [float(x) for x in (q - cents[cell])]
        cell_codes = index.filter(F.col("cell") == cell).select(
            "vec_id", "codes"
        )
        per_cell.append(
            pq_adc_topk(cell_codes, codebooks, resid, topk=topk)
        )
    out = per_cell[0]
    for df in per_cell[1:]:
        out = out.unionByName(df)
    return out.orderBy("adc_dist2", "vec_id").limit(topk)
