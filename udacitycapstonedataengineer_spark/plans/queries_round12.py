"""Round-12 staging area: the r13 ``ann_ivfpq_recall_at_k`` draft.

NOT imported by ``plans.queries`` — nothing here registers. The r12
driver window is exactly full (flagship + 2 governance re-earns + the
47-query r07 cohort, VERDICT r11 #2), so the sampled-recall query
CANNOT take a slot this round; the verdict's pre-work item (#5) is to
draft its oracle so the r13 registration is mechanical. The Spark
side (``operators/recall_eval.py``) has been test-pinned since r11;
``tests/test_round12.py::test_recall_at_k_draft_oracle_parity``
validates this draft end-to-end against DuckDB at sf0.001, so r13
only moves the ``@query`` decoration + the window row.

Reference parity: the reference pipeline has no ANN surface
(/root/reference/etl.py is a star-schema ETL); this extends the
similarity-search family SURVEY.md §2 adds beyond it.
"""

from __future__ import annotations

from ..operators.ivfpq import ivfpq_build, ivfpq_oracle_sql
from ..operators.recall_eval import ivfpq_recall_at_k
from .queries_round8 import _IVFPQ, _NPROBE, _TOPK

# The pinned query sample: deterministic ids so the DuckDB twin can
# replay the exact ground truth per query. Includes the established
# _QVEC_ID (7) so one row cross-checks the registered recall curve's
# nprobe=2 point, plus three spread ids.
_RECALL_AT_K_QUERY_IDS = (3, 7, 11, 19)


def _ivfpq_recall_at_k_oracle_sql() -> str:
    """DuckDB twin of the sampled recall@k evaluation: one full
    build+probe derived table per sampled query id — each is the
    UNCHANGED ``ivfpq_oracle_sql`` text (the driver-gated
    ann_topk_ivfpq semantics) — aggregated to (query_vec_id, hits,
    recall). The per-query union is the recall-curve oracle shape
    with the loop over query ids instead of nprobe points."""
    points = []
    for qid in _RECALL_AT_K_QUERY_IDS:
        inner = ivfpq_oracle_sql(
            dim=64,
            nprobe=_NPROBE,
            topk=_TOPK,
            query_vec_id=qid,
            exact_k=_TOPK,
            **_IVFPQ,
        )
        points.append(
            f"""SELECT {qid} AS query_vec_id,
                CAST(COUNT(CASE WHEN in_exact_topk THEN 1 END) AS BIGINT)
                    AS hits
                FROM ({inner}) q{qid}"""
        )
    u = "\nUNION ALL\n".join(points)
    return f"""
    SELECT query_vec_id, hits,
           CAST(hits AS DOUBLE) / {float(_TOPK)} AS recall
    FROM ({u})
    ORDER BY query_vec_id
    """


def _ann_ivfpq_recall_at_k_draft(spark, t):
    """The r13 query body: build once, evaluate the pinned sample via
    the one-pass multi-query ground truth + per-query ADC probes
    (operators/recall_eval.py — pinned bit-stable since r11)."""
    emb = t["embeddings"]
    cents, books, index = ivfpq_build(emb, **_IVFPQ)
    return ivfpq_recall_at_k(
        index,
        cents,
        books,
        emb,
        list(_RECALL_AT_K_QUERY_IDS),
        k=_TOPK,
        nprobe=_NPROBE,
    )
