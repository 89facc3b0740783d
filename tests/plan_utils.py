"""Plan-tree inspection helpers for tests.

ADVICE r13 #4: asserting on a substring of
``executedPlan().toString()`` is fragile for the composed-index plan
family — the session factory caps ``spark.sql.maxPlanStringLength``
(the uncapped string OOM'd the bench driver JVM), and treeString
prints scans LAST, so the cap truncates exactly the nodes a
PartitionFilters gate needs. Walking the JVM plan tree reads the scan
nodes' ``partitionFilters`` directly — no string, no cap, no flake.
"""

from __future__ import annotations


def scan_partition_filters(df) -> list[str]:
    """Collect the stringified ``partitionFilters`` of every file scan
    in ``df``'s physical plan, unwrapping AQE wrappers."""
    out: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            try:
                stack.append(node.executedPlan())
            except Exception:  # noqa: BLE001 — pre-execution AQE
                stack.append(node.initialPlan())
            continue
        if "FileSourceScan" in name:
            out.append(node.partitionFilters().mkString(","))
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out
