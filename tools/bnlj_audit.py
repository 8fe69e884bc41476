"""Standing conditioned-BroadcastNestedLoopJoin audit (r13's ad-hoc
pass, promoted to a reusable round-start gate).

A BNLJ carrying a real join condition is the triangle-defect
signature: probe cost O(left × right) at scale. Condition-less BNLJ
crossJoins of 1-row broadcast scalars (the established scalar-join
idiom) are counted but not flagged. Every known conditioned BNLJ below
is classified benign because its BUILD side is bounded BY CONSTRUCTION
— a 1-row scalar, a capped query batch, or a day-grain series bounded
by the corpus time span, never a fact-scale relation. A conditioned
BNLJ in a query NOT in KNOWN_BENIGN is a regression to re-plan, not a
finding to document (the one non-benign case ever found — triangle's
OR-of-equality close — was re-planned to an equi semi-join in r13).

Usage: PYTHONPATH=/root/repo python tools/bnlj_audit.py [sf] [round]
Writes tools/BNLJ_AUDIT_r{round}.json.
"""

from __future__ import annotations

import json
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

KNOWN_BENIGN = {
    "ann_bruteforce_topk": (
        "build = 5-row query batch; NOT(query=vec) self-pair guard"
    ),
    "ann_recall_audit": "same 5-row query batch as its exact twin",
    "balanced_class_sample": "build = per-class 1-row target counts",
    "binseg_changepoint_gain": (
        "build = 1-row (n, sn) totals; k < n guard"
    ),
    "budget_greedy_selection": "build = 1-row budget total",
    "embedding_cosine_pairs": (
        "build = capped query-side batch (documented pair cap)"
    ),
    "ewma_halving_window": (
        "20-wide band self-join over the day-grain series (bounded by "
        "corpus span, checkpointed r13)"
    ),
    "fetch_with_ties_emulation": (
        "build = 1-row cut value (WITH TIES threshold)"
    ),
    "heavy_hitters_topk": (
        "build = 1-row stream total; MG threshold guard"
    ),
    "incremental_high_watermark": "build = 1-row watermark scalar",
    "mann_kendall_trend": (
        "all-pairs over the day-grain series - Kendall's statistic "
        "needs the pair set; bounded by time span"
    ),
    "q11_important_parts": "build = 1-row global threshold",
    "q22_global_sales": "build = 1-row average balance scalar",
    "range_dimension_lookup": (
        "band join against the broadcast small range dimension - THE "
        "range-join pattern"
    ),
    "scalar_subquery_filter": "build = 1-row avg scalar",
    "seasonal_decompose_additive": (
        "two +-3 band joins over the day-grain series"
    ),
}


def main() -> None:
    # r15 (r14 ADVICE): this is a PLAN-ONLY sweep. Without the bypass,
    # checkpoint_reduced_and_release roots ~10 queries' returned plans
    # at a LogicalRDD leaf, hiding their inner join tree from this
    # audit (a conditioned BNLJ upstream of the final aggregate would
    # classify clean) — and eagerly EXECUTES each such query just to
    # explain it. The bypass keeps the sweep lazy and the inner plans
    # visible; the join shapes audited here are the production shapes
    # minus the final checkpoint hop. Set INSIDE main(), never at
    # import: tests import these tools for their helpers, and an
    # import-time env mutation would bypass the checkpoint discipline
    # for the whole test process.
    os.environ["SPARK_GRAFT_KEEP_PLAN"] = "1"
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.plans import explain_str
    from hdsp_hive_release_src_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rnd = sys.argv[2] if len(sys.argv) > 2 else "14"
    spark = get_spark(app_name="bnlj_audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    benign: dict[str, str] = {}
    actionable: dict[str, list[str]] = {}
    n_scalar = 0
    for name in sorted(registry.QUERIES):
        try:
            plan = explain_str(registry.QUERIES[name](spark, sf))
        except Exception:
            continue
        # formatted-plan detail blocks:
        #   (N) BroadcastNestedLoopJoin
        #   Join type: Cross
        #   Join condition: (v#11 > threshold#29)   | None
        conditioned = []
        scalar_only = 0
        for m in re.finditer(
            r"\(\d+\) BroadcastNestedLoopJoin[^\n]*\n"
            r"Join type: ([^\n]*)\n"
            r"Join condition: ([^\n]*)",
            plan,
        ):
            jtype, cond = m.group(1).strip(), m.group(2).strip()
            if cond and cond != "None":
                conditioned.append(f"{jtype}: {cond}"[:160])
            else:
                scalar_only += 1
        n_scalar += 1 if scalar_only else 0
        if conditioned:
            if name in KNOWN_BENIGN:
                benign[name] = KNOWN_BENIGN[name]
            else:
                actionable[name] = conditioned
                print(f"!! ACTIONABLE: {name}: {conditioned[:1]}",
                      flush=True)
    out = {
        "round": int(rnd),
        "what": (
            "Full-registry audit of BroadcastNestedLoopJoin nodes "
            "carrying a REAL join condition (the triangle defect's "
            "signature: probe cost O(left x right) at scale). "
            "Condition-less scalar crossJoins are counted, not "
            "listed. KNOWN_BENIGN entries have build sides bounded "
            "by construction (r13 baseline); any other conditioned "
            "BNLJ is a regression."
        ),
        "n_actionable": len(actionable),
        "actionable": actionable,
        "conditioned_bnlj": benign,
        "n_condition_less_scalar_crossjoin_queries": n_scalar,
    }
    path = Path(__file__).parent / f"BNLJ_AUDIT_r{rnd}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=False))
    print(
        f"wrote {path}: {len(actionable)} actionable, "
        f"{len(benign)} known-benign, {n_scalar} scalar-crossjoin "
        f"queries"
    )


if __name__ == "__main__":
    main()
