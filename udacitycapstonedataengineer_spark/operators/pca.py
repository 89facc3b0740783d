"""Distributed PCA / whitening over an embedding column.

The decomposition every embedding pipeline eventually needs (dedup
sharpening, drift dashboards, ANN pre-rotation, whitened retrieval):

- :func:`embedding_moments` — ONE distributed pass accumulating the
  sufficient statistics (n, Σx, Σxxᵀ) per partition with numpy
  (C-speed ``M.T @ M`` per Arrow batch), shuffling only O(d²) rows per
  partition, never vectors. This is the float twin of
  ``similarity.gram_matrix_int8`` (the int8 one is hash-oracle-able;
  this one feeds the eigensolve, where bit-exactness is neither
  possible nor needed).
- :func:`pca_fit` — covariance from the moments, ``numpy.linalg.eigh``
  on the d×d matrix DRIVER-SIDE. d×d is tiny by construction (d ≤ a
  few thousand); the distributed part of PCA at 100 TB is the moments
  pass, never the eigensolve.
- :func:`pca_project` / :func:`pca_whiten` — distributed projection
  onto the top-k components (optionally variance-normalized), batch
  matmul inside ``mapInPandas``; the (k, d) component matrix rides the
  UDF closure (kilobytes).

Float caveat, stated honestly: partition-order float summation makes
the moments non-bit-deterministic, so none of this registers an
oracle query — it is pinned by tolerance tests against a driver-side
numpy reference (tests/test_pca.py) instead, while the int8 Gram twin
carries the hash-exact oracle for the same plan shape.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MOMENTS_SCHEMA = "i int, j int, val double"


def embedding_moments(
    emb: DataFrame, vec_col: str = "embedding"
) -> tuple[int, np.ndarray, np.ndarray]:
    """One pass → (n, sum_vec (d,), gram (d, d)) as driver numpy.

    Encoding of the per-partition partials: gram cell (i, j) uses
    1-based i ≤ j; the vector sum rides j = 0; the row count rides
    (0, 0). A (i, j)-grain groupBy collapses partials map-side, so the
    collect is ~d²/2 rows total regardless of input size.
    """
    import pandas as pd

    def batches(it):
        G = None
        s = None
        n = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            G = M.T @ M if G is None else G + M.T @ M
            s = M.sum(axis=0) if s is None else s + M.sum(axis=0)
            n += M.shape[0]
        if G is None:
            return
        d = G.shape[0]
        iu, ju = np.triu_indices(d)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu + 1, np.arange(1, d + 1), [0]]).astype(
                    "int32"
                ),
                "j": np.concatenate(
                    [ju + 1, np.zeros(d), [0]]
                ).astype("int32"),
                "val": np.concatenate([G[iu, ju], s, [float(n)]]),
            }
        )

    rows = (
        emb.select(vec_col)
        .mapInPandas(batches, schema=MOMENTS_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    if not rows:
        raise ValueError("embedding_moments: empty input")
    cells = {(r["i"], r["j"]): r["val"] for r in rows}
    n = int(cells.pop((0, 0)))
    d = max(i for i, j in cells)
    s = np.array([cells.pop((i, 0)) for i in range(1, d + 1)])
    G = np.zeros((d, d))
    for (i, j), v in cells.items():
        G[i - 1, j - 1] = v
        G[j - 1, i - 1] = v
    return n, s, G


@dataclass
class PCAModel:
    mean: np.ndarray  # (d,)
    components: np.ndarray  # (k, d) rows = top eigenvectors
    explained_variance: np.ndarray  # (k,) eigenvalues, descending


def pca_fit(emb: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit top-``k`` principal components. Distributed moments pass +
    driver-side ``eigh`` on the d×d covariance (sample covariance,
    n-1 denominator). Deterministic sign convention: each component's
    largest-|coefficient| entry is made positive, so repeated fits on
    reshuffled data agree up to float tolerance."""
    n, s, G = embedding_moments(emb, vec_col)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    mean = s / n
    cov = (G - np.outer(s, s) / n) / (n - 1)
    eigvals, eigvecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(eigvals)[::-1][:k]
    comps = eigvecs[:, order].T
    for r in range(comps.shape[0]):
        pivot = np.argmax(np.abs(comps[r]))
        if comps[r, pivot] < 0:
            comps[r] = -comps[r]
    return PCAModel(
        mean=mean,
        components=comps,
        explained_variance=np.maximum(eigvals[order], 0.0),
    )


def _project(
    emb: DataFrame,
    model: PCAModel,
    scale: np.ndarray | None,
    vec_col: str,
    out_col: str,
) -> DataFrame:
    import pandas as pd

    W = model.components  # (k, d)
    mu = model.mean
    id_cols = [c for c in emb.columns if c != vec_col]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in emb.schema.fields
        if f.name != vec_col
    )
    schema = (schema + ", " if schema else "") + f"{out_col} array<double>"

    def batches(it):
        for pdf in it:
            M = np.array(list(pdf[vec_col]), dtype=np.float64)
            P = (M - mu) @ W.T
            if scale is not None:
                P = P * scale
            out = pdf[id_cols].copy()
            out[out_col] = list(P)
            yield out

    return emb.mapInPandas(batches, schema=schema)


def pca_project(
    emb: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """(x − μ)·Wᵀ for every row — narrow, Arrow-batched matmul; the
    model rides the closure (k·d float64 ≈ KBs)."""
    return _project(emb, model, None, vec_col, out_col)


def pca_whiten(
    emb: DataFrame,
    model: PCAModel,
    eps: float = 1e-9,
    vec_col: str = "embedding",
    out_col: str = "white",
) -> DataFrame:
    """PCA-whitened coordinates: projection scaled by λ^(-1/2) so the
    output has ~unit variance per axis — the normalization retrieval
    and dedup distance thresholds assume."""
    scale = 1.0 / np.sqrt(model.explained_variance + eps)
    return _project(emb, model, scale, vec_col, out_col)
