"""Product quantization (operators/pq.py) vs a driver-side numpy
reference implementing the identical deterministic algorithm (same
seeds, fixed-point updates, argmin tie-breaks) — codebooks and codes
must match EXACTLY; ADC ranking quality is sanity-checked against
exact L2."""

from __future__ import annotations

import numpy as np

from udacitycapstonedataengineer_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_train,
)
from udacitycapstonedataengineer_spark.sources.readers import load_table

M, K = 8, 16


def _collect_X(emb):
    rows = sorted(
        emb.select("vec_id", "embedding").collect(), key=lambda r: r["vec_id"]
    )
    ids = [r["vec_id"] for r in rows]
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, X


def _ref_train(ids, X, m, k, iters):
    """numpy twin of pq_train: quantized seeds, argmin with (dist,
    cid) tie-break (np.argmin takes the first minimum = smallest cid),
    fixed-point truncating centroid update."""
    SCALE = 1 << 20
    d = X.shape[1]
    dsub = d // m
    seed_ids = sorted(ids)[:k]
    idx_of = {v: i for i, v in enumerate(ids)}
    books = []
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        C = np.trunc(
            np.floor(sub[[idx_of[v] for v in seed_ids]] * SCALE)
        ) / SCALE
        for _ in range(iters - 1):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            newC = C.copy()
            for c in range(k):
                mask = assign == c
                if mask.any():
                    sums = np.floor(sub[mask] * SCALE).sum(axis=0)
                    newC[c] = np.trunc(sums / mask.sum()) / SCALE
            C = newC
        books.append(C)
    return books


def test_pq_train_and_encode_match_reference(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    ids, X = _collect_X(emb)
    books = pq_train(emb, m=M, k=K, iters=2)
    got = {(r["sub"], r["cid"]): np.array(r["c"]) for r in books.collect()}
    ref = _ref_train(ids, X, M, K, 2)
    assert len(got) == M * K
    for (s, c), vec in got.items():
        np.testing.assert_allclose(vec, ref[s][c], atol=1e-12, err_msg=f"{s},{c}")

    codes = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb, books, m=M).collect()
    }
    d = X.shape[1]
    dsub = d // M
    for i, vid in enumerate(ids):
        for s in range(M):
            sub = X[i, s * dsub : (s + 1) * dsub]
            d2 = ((ref[s] - sub) ** 2).sum(axis=1)
            assert codes[vid][s] == int(d2.argmin()), (vid, s)


def test_pq_adc_ranking_quality(spark, sf_dir):
    """ADC distances must equal the numpy LUT recomputation exactly,
    and the ADC top-10 must overlap the exact-L2 top-10 (compressed
    search finds true neighbors, not noise)."""
    emb = load_table(spark, sf_dir, "embeddings")
    ids, X = _collect_X(emb)
    books = pq_train(emb, m=M, k=K, iters=2)
    codes_df = pq_encode(emb, books, m=M).persist()
    query = [float(v) for v in X[7]]

    top = pq_adc_topk(codes_df, books, query, topk=10).collect()
    # exact numpy ADC for verification
    ref_books = {
        (r["sub"], r["cid"]): np.array(r["c"]) for r in books.collect()
    }
    codes = {
        r["vec_id"]: list(r["codes"]) for r in codes_df.collect()
    }
    q = np.array(query)
    dsub = X.shape[1] // M
    for r in top:
        want = sum(
            ((q[s * dsub : (s + 1) * dsub] - ref_books[(s, codes[r["vec_id"]][s])]) ** 2).sum()
            for s in range(M)
        )
        assert abs(r["adc_dist2"] - want) < 1e-9

    adc_ids = {r["vec_id"] for r in top}
    exact = np.argsort(((X - q) ** 2).sum(axis=1))[:10]
    exact_ids = {ids[i] for i in exact}
    overlap = len(adc_ids & exact_ids)
    assert overlap >= 3, (overlap, adc_ids, exact_ids)
    # the query vector itself (in the database) must surface
    assert ids[7] in adc_ids
    codes_df.unpersist()
