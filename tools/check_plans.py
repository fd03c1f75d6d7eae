"""Physical-plan assertions: the plan-shape contract for key queries.

Correctness says WHAT each operator computes; this gate pins HOW Spark
executes it — the properties that decide whether the same code survives
a 100 TB input. Run:

    python tools/check_plans.py          # assert + write PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from articulation_vector_db_api_spark.registry import load_all  # noqa: E402
from articulation_vector_db_api_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"

# query -> (must_contain, must_not_contain) regexes over explain("formatted")
EXPECTATIONS: dict[str, tuple[list[str], list[str]]] = {
    "filter_project_pushdown": (
        [r"PushedFilters: \[.*IsNotNull", r"ReadSchema: [^\n]*l_orderkey"],
        [r"ReadSchema: [^\n]*l_partkey"],  # untouched columns must be pruned
    ),
    "q1_pricing_summary": (
        # partial (map-side) + final hash aggregate, filter pushed to scan
        [r"partial_sum", r"Keys \[2\]: \[l_returnflag", r"PushedFilters: \[.*LessThanOrEqual"],
        [],
    ),
    "join_broadcast_snowflake": (
        [r"BroadcastHashJoin"],
        [r"SortMergeJoin"],
    ),
    "join_sortmerge_fact": (
        [r"SortMergeJoin"],
        [r"BroadcastNestedLoopJoin"],
    ),
    "join_semi_customers_with_urgent": (
        [r"Join .*LeftSemi|LeftSemi.*Join"],
        [],
    ),
    "join_anti_customers_no_urgent": (
        [r"LeftAnti"],
        [],
    ),
    "flagship_search": (
        [r"TakeOrderedAndProject"],
        [r"Exchange rangepartitioning"],  # no global sort for top-k
    ),
    "topk_orders_by_price": (
        [r"TakeOrderedAndProject"],
        [r"Exchange rangepartitioning"],
    ),
    "window_running_sum": (
        [r"Window .*partitionBy|\bWindow\b"],
        [],
    ),
    "dedup_exact": (
        [r"HashAggregate"],
        [r"SortMergeJoin"],  # no join needed for exact dedup
    ),
    "dedup_winnowing": (
        # pure per-row folds: no join, no aggregate anywhere
        [r"Scan parquet"],
        [r"SortMergeJoin", r"HashAggregate", r"BroadcastHashJoin"],
    ),
    "q5_region_revenue": (
        # dimension chain broadcasts; no nested-loop anywhere
        [r"BroadcastHashJoin"],
        [r"BroadcastNestedLoopJoin"],
    ),
    "search_batch_queries": (
        # query set broadcast-joined; ranking shuffles once on qid
        [r"BroadcastNestedLoopJoin|BroadcastHashJoin", r"Window"],
        [r"SortMergeJoin"],
    ),
    "sample_deterministic_hash": (
        # map-side filter only: sampling itself must not hash-shuffle
        # (the trailing Exchange rangepartitioning is the parity sort)
        [r"Scan parquet"],
        [r"Exchange hashpartitioning", r"SortMergeJoin", r"HashAggregate"],
    ),
    "merge_upsert_orders": (
        # MERGE = ONE join on the merge key, never a nested loop
        [r"SortMergeJoin .*FullOuter|FullOuter.*SortMergeJoin|ShuffledHashJoin .*FullOuter"],
        [r"BroadcastNestedLoopJoin"],
    ),
    "text_char_bigram_lm": (
        # the |alphabet|^2 model joins as broadcast; scoring never SMJs
        [r"BroadcastHashJoin", r"partial_sum"],
        [r"SortMergeJoin"],
    ),
    "q6_forecast_revenue": (
        # all four predicates reach the scan; single partial+final agg
        [r"partial_sum", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate"],
        [r"SortMergeJoin", r"BroadcastHashJoin"],
    ),
    "q10_returned_items": (
        # top-20 via TakeOrderedAndProject, nation broadcast; no global sort
        [r"TakeOrderedAndProject", r"BroadcastHashJoin"],
        [r"Exchange rangepartitioning", r"BroadcastNestedLoopJoin"],
    ),
    "q13_customer_order_distribution": (
        # outer join keeps ON-clause filter as join condition, double agg
        [r"partial_count", r"LeftOuter"],
        [r"BroadcastNestedLoopJoin"],
    ),
    "q15_top_supplier": (
        # scalar max broadcasts back — lineitem is scanned, never nested-looped
        [r"BroadcastHashJoin"],
        [r"BroadcastNestedLoopJoin", r"CartesianProduct"],
    ),
    "q18_large_volume_customers": (
        # IN-subquery = semi join; final top-100 avoids a global sort
        [r"LeftSemi", r"TakeOrderedAndProject"],
        [r"Exchange rangepartitioning", r"BroadcastNestedLoopJoin"],
    ),
    "layout_zorder_stats": (
        # bit interleave stays in codegen'd expressions: no UDF, one agg
        [r"partial_count", r"partial_min"],
        [r"BatchEvalPython", r"ArrowEvalPython"],
    ),
}


def main() -> int:
    spark = get_spark("plan-check")
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_all()
    failures = []
    sections = []
    for name, (must, must_not) in sorted(EXPECTATIONS.items()):
        df = registry[name].fn(spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        bad = [p for p in must if not re.search(p, plan)] + [
            f"!{p}" for p in must_not if re.search(p, plan)
        ]
        status = "OK" if not bad else f"FAIL {bad}"
        print(f"{status:6} {name}")
        if bad:
            failures.append(name)
        physical = plan.split("\n\n")[0]
        sections.append(f"## {name} — {status}\n\n```\n{physical.strip()}\n```\n")

    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(
            "# PLANS — physical-plan contract (generated by tools/check_plans.py)\n\n"
            "Plan-shape assertions for the queries where execution strategy\n"
            "decides 100 TB viability: pushdown + pruning reach the scan,\n"
            "dimension joins broadcast, fact joins sort-merge, top-k avoids\n"
            "global sorts, aggregates are partial+final.\n\n" + "\n".join(sections)
        )
    print(f"\n{len(EXPECTATIONS) - len(failures)}/{len(EXPECTATIONS)} plans OK")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
