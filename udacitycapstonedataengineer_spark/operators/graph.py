"""Connected components over near-duplicate pair edges.

Pairwise near-dup output (dedup.py) is not enough to dedup a corpus:
if A≈B and B≈C, dropping "the higher id of each pair" can still keep
two documents from the same duplicate cluster {A,B,C}. The fix is the
transitive closure — connected components over the pair graph, keep
one canonical doc per component.

Algorithm: hash-min label propagation. Every node starts labeled with
its own id; each round every node takes the min label among itself and
its neighbors; converges in O(graph diameter) rounds. Each round is
one join + one groupBy — all shuffles on the node id, no driver-side
graph. ``localCheckpoint`` cuts the lineage every round so the plan
doesn't grow with iterations (the classic iterative-Spark trap: 20
rounds of accumulated lineage re-executes round 1 twenty times).

Duplicate clusters are overwhelmingly tiny (pairs/triples), so
real-corpus convergence is 2-4 rounds; max_iter bounds adversarial
chains. At 100 TB the edge set (near-dup pairs) is orders of magnitude
smaller than the corpus — the components job runs on pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    a: str = "doc_a",
    b: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable. Raises if not converged within
    ``max_iter`` rounds (pathological chain longer than max_iter)."""
    sym = edges.select(
        F.col(a).alias("src"), F.col(b).alias("dst")
    ).union(edges.select(F.col(b).alias("src"), F.col(a).alias("dst")))
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    comp_type = dict(labels.dtypes)["comp"]
    for _ in range(max_iter):
        # the convergence probe rides INSIDE the label aggregation
        # (VERDICT r3 #7): self rows carry the previous label in a
        # `prev` sidecar (exactly one self row per node, so max(prev)
        # recovers it); neighbor rows carry null. Convergence is then
        # a filter-count on the checkpointed label table — no extra
        # join job per round.
        neighbor = sym.join(
            labels, sym.dst == labels.node
        ).select(
            F.col("src").alias("node"),
            "comp",
            F.lit(None).cast(comp_type).alias("prev"),
        )
        merged = (
            labels.select("node", "comp", F.col("comp").alias("prev"))
            .union(neighbor)
            .groupBy("node")
            .agg(
                F.min("comp").alias("comp"),
                F.max("prev").alias("prev"),
            )
            .localCheckpoint()
        )
        improved = (
            merged.filter(F.col("comp") < F.col("prev")).limit(1).count()
        )
        labels = merged.select("node", "comp")
        if improved == 0:
            return labels
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_transitive(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Keep one canonical doc (min id) per duplicate CLUSTER — the
    closure of the pairwise near-dup relation. Docs in no pair pass
    through untouched (left join against the tiny component map)."""
    comp = connected_components(pairs)
    canon = comp.groupBy("comp").agg(F.min("node").alias("canonical"))
    keepers = comp.join(canon, "comp").filter(
        F.col("node") == F.col("canonical")
    ).select(F.col("node").alias(id_col))
    in_graph = comp.select(F.col("node").alias(id_col))
    return docs.join(
        in_graph.exceptAll(keepers), id_col, "left_anti"
    )
