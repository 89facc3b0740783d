"""Round-13 registrations: the three r12-staged queries take their
driver-window slots (VERDICT r12 next #1).

The bodies and oracles were drafted, test-pinned, and sf0.001
parity-proven in round 12 (``plans/queries_round12.py`` +
``tests/test_round12.py``); this module only moves the ``@query``
decoration — the mechanical step the staging discipline exists for:

- ``ann_ivfpq_recall_at_k`` — sampled recall@k over the IVF-PQ index
  (operators/recall_eval.py, one-pass multi-query exact ground truth).
- ``text_kn_trigram_incremental`` — the two-anti-join-grain trigram
  merge; its oracle is the UNCHANGED full-corpus
  ``text_kn_trigram_prob`` SQL, so the driver's hash equality IS the
  append-equals-rebuild proof (the bigram row's discipline one
  recursion level deeper).
- ``docs_lm_quality_score`` — perplexity-shaped quality filtering over
  the KN bigram LM, hash-safe via fixed-point BIGINT per-document
  aggregation.

Reference parity: the reference pipeline has no ANN/LM surface
(/root/reference/etl.py is a star-schema ETL); these extend the
similarity-search and text-analysis families SURVEY.md §2 adds.
"""

from __future__ import annotations

from .queries_round12 import (
    _ann_ivfpq_recall_at_k_draft,
    _docs_lm_quality_score_draft,
    _docs_lm_quality_score_oracle_sql,
    _ivfpq_recall_at_k_oracle_sql,
    _text_kn_trigram_incremental_draft,
)
from .registry import ORACLE, query

query("ann_ivfpq_recall_at_k", _ivfpq_recall_at_k_oracle_sql())(
    _ann_ivfpq_recall_at_k_draft
)
# oracle = the committed full-corpus trigram SQL, byte-identical:
# hash equality proves the incremental merge ≡ a rebuild
query("text_kn_trigram_incremental", ORACLE["text_kn_trigram_prob"])(
    _text_kn_trigram_incremental_draft
)
query("docs_lm_quality_score", _docs_lm_quality_score_oracle_sql())(
    _docs_lm_quality_score_draft
)
