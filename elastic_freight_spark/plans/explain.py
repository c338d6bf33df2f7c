"""Physical-plan introspection (SURVEY.md §4): the engine's scale
properties as *checkable assertions*, not hopes.

The reference hand-tunes a fixed physical pipeline (hadoop_config.json
spill/sort/compress knobs); on Spark the physical plan is chosen by
Catalyst, so the engineering discipline moves from hand-tuning to
*verifying the optimizer did what the 100 TB story needs*:

* filters reached the Parquet scan (``PushedFilters``) — a scan that
  filters 100 TB post-read instead of in the reader is a 100× error;
* the scan schema is pruned to referenced columns (``ReadSchema``) —
  reading all columns for a 2-column projection is wrong;
* partition filters prune directories (shard-pruned lookup reads 1 of
  N shard dirs);
* small dimensions broadcast (no shuffle of the big side);
* the hot path stays inside WholeStageCodegen with no Python
  (Batch)EvalPython stages.

These helpers parse ``df._jdf.queryExecution()`` formatted output and
back both the test suite and ad-hoc plan review.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`EXPLAIN FORMATTED` text for a DataFrame."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _scan_nodes(plan: str) -> list[str]:
    """Split the formatted plan into per-node detail blocks for scans."""
    return re.findall(r"\(\d+\) Scan parquet[\s\S]*?(?=\n\(\d+\)|\Z)", plan)


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Every ``fragment`` must appear in some scan's PushedFilters —
    i.e. the predicate reached the Parquet reader."""
    plan = formatted_plan(df)
    pushed = " ".join(
        m.group(1) for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan)
    )
    for frag in fragments:
        assert frag in pushed, (
            f"filter {frag!r} not pushed to scan; PushedFilters=[{pushed}]\n{plan}"
        )


def assert_read_schema_pruned(
    df: DataFrame, must_have: list[str], must_not_have: list[str]
) -> None:
    """Column pruning check on the scan's ReadSchema."""
    plan = formatted_plan(df)
    schemas = " ".join(re.findall(r"ReadSchema: (.*)", plan))
    for col in must_have:
        assert col in schemas, f"column {col} missing from ReadSchema: {schemas}"
    for col in must_not_have:
        assert col not in schemas, f"column {col} NOT pruned from scan: {schemas}"


def assert_partition_pruned(df: DataFrame, col: str) -> None:
    """A partition-column filter must land in PartitionFilters (so the
    scan lists only matching directories — the reference's shard-pruned
    lookup, ElasticsearchRoutingStrategyV5.java:97-113)."""
    plan = formatted_plan(df)
    pf = " ".join(re.findall(r"PartitionFilters: \[(.*?)\]", plan))
    assert re.search(rf"\b{re.escape(col)}\b", pf), (
        f"no partition filter on {col}; PartitionFilters=[{pf}]\n{plan}"
    )


def assert_broadcast_join(df: DataFrame, expect: int = 1) -> None:
    """At least ``expect`` broadcast joins in the plan (small dims must
    not shuffle the fact side)."""
    plan = formatted_plan(df)
    n = len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))
    assert n >= expect, f"expected ≥{expect} broadcast joins, found {n}\n{plan}"


def assert_no_python_in_plan(df: DataFrame) -> None:
    """The hot path must stay JVM-side: no (Arrow/Batch)EvalPython,
    no MapInPandas/FlatMapGroupsInPandas stages."""
    plan = formatted_plan(df)
    bad = re.findall(r"EvalPython|InPandas|PythonMapInArrow", plan)
    assert not bad, f"Python stages in plan: {bad}\n{plan}"


def codegen_stage_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider = fewer pipeline
    breaks; 0 means something disabled codegen entirely).

    AQE hides codegen ids until the plan is final — if needed this
    EXECUTES the query once to finalize it (use on test-sized data).
    """
    ids = set(re.findall(r"codegen id : (\d+)", formatted_plan(df)))
    if not ids and "isFinalPlan=false" in formatted_plan(df):
        # collect() runs the DataFrame's own QueryExecution, which
        # finalizes the adaptive plan in place (a write would plan
        # separately and leave this one unfinalized)
        df.collect()
        ids = set(re.findall(r"codegen id : (\d+)", formatted_plan(df)))
    return len(ids)
