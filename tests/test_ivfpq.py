"""IVF-PQ composition (operators/ivfpq.py): index integrity, probe
pruning, and retrieval quality vs exact L2."""

from __future__ import annotations

import numpy as np

from udacitycapstonedataengineer_spark.operators.ivfpq import (
    ivfpq_build,
    ivfpq_topk,
)
from udacitycapstonedataengineer_spark.sources.readers import load_table

NLIST, M, K = 8, 8, 16


def test_ivfpq_index_integrity_and_retrieval(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
    )
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    cents, books, index = ivfpq_build(emb, nlist=NLIST, m=M, k=K)
    idx = index.persist()

    # every vector indexed exactly once, cells within range, codes
    # well-formed
    got = idx.collect()
    assert len(got) == len(ids)
    assert {r["vec_id"] for r in got} == set(ids)
    for r in got:
        assert 0 <= r["cell"] < NLIST
        assert len(r["codes"]) == M
        assert all(0 <= c < K for c in r["codes"])
    # cells are the TRUE nearest coarse centroids (spot-check)
    cmap = {r["cid"]: np.array(r["c"]) for r in cents.collect()}
    cells = {r["vec_id"]: r["cell"] for r in got}
    for i in (0, 7, 99):
        d2 = {cid: ((X[i] - c) ** 2).sum() for cid, c in cmap.items()}
        best = min(d2, key=lambda cid: (d2[cid], cid))
        assert cells[ids[i]] == best

    # retrieval: the query vector itself must come back; top-10 must
    # overlap exact L2 top-10
    query = [float(v) for v in X[7]]
    top = ivfpq_topk(idx, cents, books, query, nprobe=2, topk=10).collect()
    top_ids = {r["vec_id"] for r in top}
    assert ids[7] in top_ids
    exact = {ids[i] for i in np.argsort(((X - X[7]) ** 2).sum(axis=1))[:10]}
    assert len(top_ids & exact) >= 3, top_ids

    # probe pruning is real: results only come from the nprobe cells
    # nearest the query
    probed = sorted(
        cmap,
        key=lambda cid: (((X[7] - cmap[cid]) ** 2).sum(), cid),
    )[:2]
    for r in top:
        assert cells[r["vec_id"]] in probed
    idx.unpersist()
