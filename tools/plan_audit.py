"""Physical-plan lint over the whole registry (sf0.01, plans only —
nothing executes): flags the two scale smells a green correctness row
can hide.

1. UNPRUNED SCAN — a FileScan whose ReadSchema carries every column
   of a wide table (>= MIN_WIDTH cols). Catalyst prunes columns for
   free when the plan is declarative, so a full-width scan means some
   operator blocks pruning (an opaque UDF over the whole row, a
   star-select before a Python surface, ...). At 100 TB that is the
   difference between scanning 2 columns and scanning 10.
2. CARTESIAN PRODUCT — a CartesianProduct node. Deliberate 1-row
   broadcast crossJoins plan as BroadcastNestedLoopJoin, so anything
   that still plans as CartesianProduct is an unbroadcast cross —
   quadratic at scale.

Exit code 1 if anything is flagged. Complements
tests/test_plans.py::test_every_registered_query_plans_jvm_only
(which guards the JVM-only property, not scan shape).

Known-full-width reads are allowlisted with the reason inline.
"""
import json
import re
import sys

sys.path.insert(0, "/root/repo")
from elastic_freight_spark.session import get_spark, load_tables

SF_DIR = "/root/testdata/sf0.01"
MIN_WIDTH = 5  # narrow dims (region: 3 cols) legitimately read whole

# query -> {table: reason} for legitimate full-width scans
ALLOW = {
    # profiling/DQ queries exist to look at every column
    "profile_documents_table": {"documents": "whole-table profiler"},
    "dq_documents_constraints": {"documents": "whole-table DQ gate"},
    "dq_orders_constraints": {"orders": "whole-table DQ gate"},
    "dq_embeddings_constraints": {"embeddings": "whole-table DQ gate"},
    "source_dataset_card": {"documents": "dataset-card profiler"},
}

TABLE_WIDTHS = {}


def main() -> None:
    spark = get_spark(
        app_name="plan_audit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    t = load_tables(spark, SF_DIR)
    for name, df in t.items():
        TABLE_WIDTHS[name] = len(df.columns)

    import __spark_entry__ as e

    findings = []
    for name, fn in e.queries().items():
        try:
            plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # plan-time failure is its own finding
            findings.append({"query": name, "kind": "plan_error", "detail": str(exc)[:200]})
            continue
        if "CartesianProduct" in plan:
            findings.append({"query": name, "kind": "cartesian_product"})
        for m in re.finditer(
            r"FileScan parquet \[([^\]]*)\].*?/([a-z]+)\.parquet", plan
        ):
            cols = [c.split("#")[0] for c in m.group(1).split(",") if c]
            table = m.group(2)
            width = TABLE_WIDTHS.get(table)
            if (
                width is not None
                and width >= MIN_WIDTH
                and len(cols) >= width
                and table not in ALLOW.get(name, {})
            ):
                findings.append(
                    {
                        "query": name,
                        "kind": "unpruned_scan",
                        "table": table,
                        "cols": len(cols),
                    }
                )
    print(json.dumps({"flagged": findings, "n": len(findings)}))
    spark.stop()
    sys.exit(1 if findings else 0)


if __name__ == "__main__":
    main()
