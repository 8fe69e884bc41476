"""One-shot audit: flag RE-EXECUTED physical-plan subtrees — the
triangle defect class the parquet-leaf scan sweep is structurally
blind to (a repeated join/aggregate subtree hanging off a
localCheckpoint has zero `Location` lines, so tools/scan_sweep.py
never sees it).

Method: parse the operator tree of every registered query's formatted
physical plan, fingerprint each subtree by its operator-chain shape
(operator names + child fingerprints, expression ids stripped), and
flag any fingerprint that (a) occurs >= 2x in one plan, (b) contains a
Join or Aggregate (cheap scan/project repeats are the normal two sides
of a self-join), and (c) is not a `ReusedExchange`/`ReusedSubquery`
reference (those are Spark's own dedup — a reference, not a re-run).
Only MAXIMAL repeated subtrees are reported (a flagged subtree's
descendants are not re-reported).

A repeated subtree in the STATIC plan text is a real re-execution:
Spark's exchange reuse (on by default) rewrites the second occurrence
of an identical exchange-rooted subtree to `ReusedExchange` at plan
time, so anything still printed in full twice will run twice.

Known-legitimate repeats are exempted with a reason below — the
`deg`-style union off a checkpoint is invisible here anyway (the
checkpoint IS the leaf); what this catches is the `tri`-style union
off a live join (queries/graph.py's r12 shape, fixed in r13).

Usage: PYTHONPATH=/root/repo python tools/subtree_sweep.py [sf] [round]
Writes tools/SUBTREE_SWEEP_r{round}.json (one entry per query:
clean / flagged / exempt / unplannable).
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter

# queries whose repeated subtree IS the demonstrated semantics —
# same adjudication style as SCAN_SWEEP by_design
EXEMPT: dict[str, str] = {
    # r13 narrowing: eight r12-era exemptions (join hints, NOT IN
    # twin, set ops, merge, sampling twins, HLL contract, recall
    # audit, set algebra) recorded ZERO hits once the fingerprint
    # included operator detail — their "repeats" are distinct
    # computations, so they are checked as normal now. Exempt queries
    # are still planned and their hits recorded in the artifact.
    "semantic_dedup": "the repeated subtree is the broadcast semi-filter of the cell cap applied directly over the materialized assignment parquet - map-side, no shuffle; its two executions ARE the two self-join sides reading the artifact, and a third materialization of the filtered cells would cost more IO than the filter",
}

_MARKER = re.compile(r"^((?:[:+][- ]\s?|\s{3})*)\*?\s*(.+?)\s*$")
_EXPR_ID = re.compile(r"#\d+[A-Za-z]*")
_PLAN_ID = re.compile(r"\((\d+)\)")
_NOISE = re.compile(r"plan_id=\d+|id=#?\d+|Reuses operator id: \d+")
_DETAIL_HDR = re.compile(r"^\((\d+)\) (.+?)(?: \[codegen id : \d+\])?$")
_EXPENSIVE = re.compile(
    r"Join|HashAggregate|SortAggregate|ObjectHashAggregate|Window"
)
_REUSE = re.compile(
    # Reused* are plan-time references; InMemory* repeats are reads of
    # a table persisted once — materialization working as designed,
    # not re-execution (the cache-build plan prints under every read).
    r"ReusedExchange|ReusedSubquery|InMemoryRelation|InMemoryTableScan"
)


def _tree_lines(plan: str) -> list[str]:
    """The operator-tree section of a formatted explain: from the
    '== Physical Plan ==' header to the first blank line."""
    lines = plan.splitlines()
    try:
        start = next(
            i for i, ln in enumerate(lines) if ln.startswith("== Physical Plan")
        ) + 1
    except StopIteration:
        return []
    out = []
    for ln in lines[start:]:
        if not ln.strip():
            break
        out.append(ln)
    return out


def _details(plan: str) -> dict[str, str]:
    """Per-operator detail blocks of a formatted explain, normalized:
    expression ids and plan-id noise stripped. Keyed by the operator's
    plan number. The detail (keys, aggregate functions, join
    conditions, scan locations, RDD arguments) is what distinguishes
    two same-shaped but different computations — without it the sweep
    flags every pair of shape-identical aggregates."""
    out: dict[str, list[str]] = {}
    cur: str | None = None
    in_details = False
    for ln in plan.splitlines():
        if ln.startswith("== Physical Plan"):
            in_details = True
            continue
        if not in_details:
            continue
        m = _DETAIL_HDR.match(ln)
        if m:
            cur = m.group(1)
            out[cur] = [m.group(2)]
            continue
        if cur is not None:
            if not ln.strip():
                cur = None
                continue
            out[cur].append(ln.strip())
    return {
        k: _NOISE.sub("", _EXPR_ID.sub("#", "\n".join(v)))
        for k, v in out.items()
    }


class _Node:
    __slots__ = ("op", "detail", "children", "fp", "size")

    def __init__(self, op: str, detail: str):
        self.op = op
        self.detail = detail
        self.children: list[_Node] = []
        self.fp = ""
        self.size = 1


def _parse(lines: list[str], details: dict[str, str]) -> _Node | None:
    """Indentation-based parse of the formatted operator tree."""
    root = None
    stack: list[tuple[int, _Node]] = []
    for ln in lines:
        m = _MARKER.match(ln)
        if not m:
            continue
        depth = len(m.group(1)) // 3
        raw = m.group(2)
        pid = _PLAN_ID.search(raw)
        op = _PLAN_ID.sub("", _EXPR_ID.sub("#", raw)).strip()
        node = _Node(op, details.get(pid.group(1), "") if pid else "")
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            stack[-1][1].children.append(node)
        else:
            root = node
        stack.append((depth, node))
    return root


def _fingerprint(node: _Node) -> None:
    # r17: Reused*/InMemory* nodes fingerprint as OPAQUE LEAVES — the
    # cache-build plan EXPLAIN prints under every InMemoryTableScan
    # executes once however many reads display it (the exemption
    # _flag already applies when DESCENDING), so its operators must
    # not leak into ANCESTOR fingerprints either. Before this, a
    # cheap repeated cache-read chain (Sort/Exchange over an
    # InMemoryTableScan whose printed build plan contains a join)
    # classified "expensive" and false-flagged — first hit by the r17
    # persist-tier materializations (semantic_dedup members,
    # pagerank contrib). A genuinely re-executed join ABOVE caches
    # still flags: its Join node sits above the truncation point.
    if _REUSE.search(node.op):
        node.fp = node.op + "{}[]"
        node.size = 1
        node.children = []
        return
    for c in node.children:
        _fingerprint(c)
        node.size += c.size
    node.fp = (
        node.op
        + "{"
        + node.detail
        + "}["
        + ",".join(c.fp for c in node.children)
        + "]"
    )


def _flag(root: _Node) -> list[dict]:
    """Maximal repeated expensive subtrees: fingerprint count >= 2,
    contains a join/aggregate/window, not a Reused* reference."""
    counts: Counter[str] = Counter()

    def walk(n: _Node) -> None:
        counts[n.fp] += 1
        for c in n.children:
            walk(c)

    walk(root)
    flagged: list[dict] = []
    seen: set[str] = set()

    def visit(n: _Node, under_flagged: bool) -> None:
        if _REUSE.search(n.op):
            # everything below a Reused*/InMemory* node is the
            # cache-build plan printed per read — built once, so its
            # repeats are never re-executions
            return
        hit = (
            not under_flagged
            and counts[n.fp] >= 2
            and n.size >= 3
            and _EXPENSIVE.search(n.fp) is not None
        )
        if hit and n.fp not in seen:
            seen.add(n.fp)
            flagged.append(
                {"op": n.op, "occurrences": counts[n.fp], "size": n.size}
            )
        for c in n.children:
            visit(c, under_flagged or hit)

    visit(root, False)
    return flagged


def main() -> None:
    # r15 (r14 ADVICE): plan-only sweep — keep checkpoint-using
    # queries lazy and their inner operator trees visible (a repeated
    # subtree upstream of the final aggregate must not hide behind the
    # LogicalRDD leaf checkpoint_reduced_and_release would otherwise
    # root the plan at). Set INSIDE main(), never at import — tests
    # import this module for its parser helpers, and an import-time
    # env mutation would bypass the checkpoint discipline for the
    # whole test process. See tools/bnlj_audit.py.
    os.environ["SPARK_GRAFT_KEEP_PLAN"] = "1"
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.plans import explain_str
    from hdsp_hive_release_src_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rnd = sys.argv[2] if len(sys.argv) > 2 else "14"
    spark = get_spark(app_name="subtree_sweep", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    entries: dict[str, dict] = {}
    n_flagged = 0
    for name in sorted(registry.QUERIES):
        try:
            plan = explain_str(registry.QUERIES[name](spark, sf))
        except Exception as ex:  # streaming/ddl queries may not plan
            entries[name] = {
                "status": "unplannable",
                "reason": type(ex).__name__,
            }
            continue
        root = _parse(_tree_lines(plan), _details(plan))
        if root is None:
            entries[name] = {"status": "unplannable", "reason": "no tree"}
            continue
        _fingerprint(root)
        hits = _flag(root)
        if name in EXEMPT:
            # exempt queries are still PLANNED and their repeats
            # recorded — the exemption documents the by-design hits,
            # it must not hide new unrelated ones
            entries[name] = {
                "status": "exempt",
                "reason": EXEMPT[name],
                "subtrees": hits,
            }
        elif hits:
            n_flagged += 1
            entries[name] = {"status": "flagged", "subtrees": hits}
            print(f"{name}: {hits}", flush=True)
        else:
            entries[name] = {"status": "clean"}
    print(f"# done: {n_flagged} queries with repeated expensive subtrees")
    out = {
        "round": int(rnd),
        "n_queries": len(entries),
        "n_flagged": n_flagged,
        "entries": entries,
    }
    with open(f"tools/SUBTREE_SWEEP_r{rnd}.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)


if __name__ == "__main__":
    main()
