"""Executed-plan metrics (SURVEY.md §1 counters row, §4): read the
real runtime numbers — shuffle bytes/records, scan rows/files, peak
memory — off the physical plan after execution.

The reference exposes 8 Hadoop job counters (doc created/failed,
per-phase ms — job/BaseESReducer.java:60-62); Spark's SQLMetric system
tracks far more per physical node. This module surfaces them as plain
dicts so tests can assert *measured* scale behavior:

* partial (map-side) aggregation ⇒ shuffled records ≪ scanned rows
* broadcast join ⇒ fact side never shuffles
* AQE coalescing ⇒ empty post-shuffle partitions folded away

Driver-side and cheap: the traversal walks the already-executed plan
via py4j; nothing re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def execution_metrics(df: DataFrame, run: bool = True) -> list[dict]:
    """Per-node metrics of ``df``'s executed plan, root-first.

    ``run=True`` collects the DataFrame first (AQE metrics only exist
    after execution). Each entry: ``{"node": str, "depth": int,
    "metrics": {name: value}}``.
    """
    if run:
        df.collect()
    out: list[dict] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        md = {}
        it = node.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            md[kv._1()] = kv._2().value()
        out.append({"node": name, "depth": depth, "metrics": md})
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan(), depth + 1)
            return
        if "QueryStage" in name:
            walk(node.plan(), depth + 1)
            return
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), depth + 1)

    walk(df._jdf.queryExecution().executedPlan(), 0)
    return out


def summarize(nodes: list[dict]) -> dict:
    """Roll the per-node metrics up to the scale-relevant totals."""
    s = {
        "n_shuffles": 0,
        "shuffle_bytes_written": 0,
        "shuffle_records_written": 0,
        "n_broadcasts": 0,
        "scan_rows": 0,
        "scan_files": 0,
        "scan_bytes": 0,
        "peak_memory_max": 0,
    }
    for n in nodes:
        m = n["metrics"]
        if n["node"] == "Exchange":
            s["n_shuffles"] += 1
            s["shuffle_bytes_written"] += m.get("shuffleBytesWritten", 0)
            s["shuffle_records_written"] += m.get("shuffleRecordsWritten", 0)
        elif n["node"] == "BroadcastExchange":
            s["n_broadcasts"] += 1
        elif n["node"].startswith("Scan "):
            s["scan_rows"] += m.get("numOutputRows", 0)
            s["scan_files"] += m.get("numFiles", 0)
            s["scan_bytes"] += m.get("filesSize", 0)
        s["peak_memory_max"] = max(s["peak_memory_max"], m.get("peakMemory", 0))
    return s


def shuffle_summary(df: DataFrame, run: bool = True) -> dict:
    """One-call 'did this shuffle more than it should' probe."""
    return summarize(execution_metrics(df, run=run))


def executed_scans(df: DataFrame, run: bool = True) -> list[str]:
    """One-line description of every scan leaf that actually executes.

    Cached lineage rendered inside an InMemoryRelation does NOT
    execute — InMemoryTableScan is a leaf in the executed plan — so
    this is the honest "which files did this query read" probe that
    a string-match over ``explain()`` output can't give (explain
    prints the cached plan's original scans too)."""
    if run:
        df.collect()
    out: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        if name.startswith("Scan"):
            out.append(node.simpleString(100))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out
