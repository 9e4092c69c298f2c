"""Execution-metric auditing: measured shuffle/broadcast traffic.

``exchange_stats(df)`` walks the EXECUTED (post-AQE) physical plan of
a DataFrame whose action has already run and sums the real SQLMetrics
on every shuffle and broadcast exchange.  This turns the engine's
"minimize shuffles" design rule (SURVEY §4) into something a test can
pin: the bytes below are what actually crossed an exchange, i.e. what
becomes network traffic on a real cluster.

Used by scripts/shuffle_audit.py (SHUFFLES.md generator) and
tests/test_shuffle_bounds.py (regression bounds on partial
aggregation and group-limit top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _metrics(node) -> dict[str, int]:
    out = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        out[kv._1()] = kv._2().value()
    return out


def _children(node):
    ch = node.children()
    out = [ch.apply(i) for i in range(ch.size())]
    if not out:
        # QueryStageExec (plan) and unary wrappers expose the subtree
        # behind an accessor instead of children()
        for acc in ("plan", "child"):
            try:
                sub = getattr(node, acc)()
                if sub is not None and hasattr(sub, "nodeName"):
                    out.append(sub)
                    break
            except Exception:
                pass
    return out


def exchange_stats(df: DataFrame) -> dict[str, int]:
    """Sum exchange metrics over ``df``'s executed plan.

    The DataFrame's OWN action must have run (``collect()``, not
    ``count()`` — count plans a separate aggregate whose metrics stay
    at zero on this lineage).  Returns exchanges / shuffle_records /
    shuffle_bytes / broadcasts / broadcast_bytes.  ReusedExchange
    nodes are skipped (their traffic is counted at the original);
    localCheckpoint-sealed prefixes run as separate jobs and are NOT
    included (the final plan reads them as Scan ExistingRDD)."""
    plan = df._jdf.queryExecution().executedPlan()
    if plan.nodeName().startswith("AdaptiveSparkPlan"):
        plan = plan.executedPlan()
    agg = {"exchanges": 0, "shuffle_records": 0, "shuffle_bytes": 0,
           "broadcasts": 0, "broadcast_bytes": 0}
    seen: set[int] = set()

    def walk(node):
        nid = node.id()
        name = node.nodeName()
        if name.startswith("ReusedExchange") or nid in seen:
            return
        seen.add(nid)
        if name == "Exchange":
            m = _metrics(node)
            agg["exchanges"] += 1
            agg["shuffle_records"] += int(m.get("shuffleRecordsWritten", 0))
            agg["shuffle_bytes"] += int(m.get("shuffleBytesWritten", 0))
        elif name.startswith("BroadcastExchange"):
            m = _metrics(node)
            agg["broadcasts"] += 1
            agg["broadcast_bytes"] += int(m.get("dataSize", 0))
        for c in _children(node):
            walk(c)

    walk(plan)
    return agg
