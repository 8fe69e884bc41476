"""Round-start gate runner: sequence all six standing gates.

One command replaces the six invocations a round opens with, runs
them as separate processes (each tool manages its own Spark session
and artifact), and writes tools/GATES_r{N}.json summarizing per-gate
status so the round log has a single go/no-go record.

The gates and their pass criteria:

1. scan_sweep (sf0.001, KEEP_PLAN) — stdout-only tool; the runner
   parses its flagged lines and passes iff the flagged NAME SET
   equals the pinned r13-r16 baseline (KNOWN_SCAN_FLAGGED below —
   each entry's 3-4 plan-visible scans is documented multi-read
   semantics; see SCAN_SWEEP_r16.json). A new name OR a disappeared
   name fails: both directions mean a plan changed without
   adjudication.
2. subtree_sweep (sf0.001) — writes SUBTREE_SWEEP_r{N}.json; exit 0
   iff no repeated-subtree flag.
3. runtime_sweep (sf0.001) — writes RUNTIME_SWEEP_r{N}.json; exit 0
   iff 0 actionable / 0 retained-cache actionable / 0 errors.
4. bnlj_audit (sf0.001) — writes BNLJ_AUDIT_r{N}.json; exit 0 iff 0
   actionable conditioned BNLJs.
5. audit_rounding --all — writes ROUNDING_AUDIT.json; exit 0 iff no
   order-unstable query.
6. scale_parity_sweep (sf0.1) — writes SCALE_PARITY_SWEEP_r{N}.json;
   exit 0 iff 494/494 cross-engine PASS at 10x the driver-gated
   scale. The longest gate (~18-30 min); skip with --skip-parity for
   a quick five-gate pass while iterating, but the round's committed
   record must include it.

Usage::

    python tools/run_gates.py [round] [--skip-parity]

Round defaults to newest CORRECTNESS_r*.json + 1. Exit 0 iff every
gate passed. Total budget ~30-45 min with parity, ~10-15 without.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# The pinned scan-sweep baseline (unchanged r13-r16): names whose >=3
# plan-visible scans of one table are documented multi-read semantics
# (self-join families, recall audits comparing two index paths,
# UNION'd strategy demos). Adjudicate any delta in-round, then update
# this pin and the SCAN_SWEEP artifact note together.
KNOWN_SCAN_FLAGGED = {
    "ann_ivf_topk",
    "ann_recall_audit",
    "cross_source_dedup_matrix",
    "decontaminate_ngrams",
    "dedup_minhash_lsh",
    "join_hint_strategies",
    "merge_upsert",
    "not_in_null_semantics",
    "set_ops",
}


def _default_round() -> str:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return str(max(rounds) + 1) if rounds else "0"


def _run(argv: list[str]) -> tuple[int, str]:
    import os

    proc = subprocess.run(
        [sys.executable, *argv],
        cwd=REPO,
        env={**os.environ, "PYTHONPATH": str(REPO)},
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr[-1500:])
    return proc.returncode, proc.stdout


def _scan_gate() -> dict:
    """Run scan_sweep and compare its flagged set to the pin."""
    rc, out = _run(["tools/scan_sweep.py"])
    flagged = {}
    for line in out.splitlines():
        if line.startswith("#") or ":" not in line:
            continue
        name = line.split(":", 1)[0].strip()
        if name:
            flagged[name] = line.split(":", 1)[1].strip()
    new = sorted(set(flagged) - KNOWN_SCAN_FLAGGED)
    gone = sorted(KNOWN_SCAN_FLAGGED - set(flagged))
    return {
        "ok": rc == 0 and not new and not gone,
        "flagged": flagged,
        "new_vs_pin": new,
        "gone_vs_pin": gone,
    }


def main() -> None:
    rnd = next(
        (a for a in sys.argv[1:] if not a.startswith("--")),
        _default_round(),
    )
    # the per-tool artifacts record `"round": int(rnd)` — fail here
    # with a clear message rather than three tools deep
    int(rnd)
    skip_parity = "--skip-parity" in sys.argv
    sf_small = "/root/testdata/sf0.001"
    sf_parity = "/root/testdata/sf0.1"
    results: dict[str, dict] = {}

    t0 = time.time()
    results["scan_sweep"] = _scan_gate()

    # these three always exit 0; the gate reads each one's artifact
    # and passes iff its actionable counters are zero
    artifact_gates = {
        "subtree_sweep": lambda a: a["n_flagged"] == 0,
        "runtime_sweep": lambda a: (
            a["n_actionable"] == 0
            and a["n_retained_cache_actionable"] == 0
            and not a["errors"]
        ),
        "bnlj_audit": lambda a: a["n_actionable"] == 0,
    }
    for tool, passes in artifact_gates.items():
        rc, _ = _run([f"tools/{tool}.py", sf_small, rnd])
        apath = REPO / "tools" / f"{tool.upper()}_r{rnd}.json"
        try:
            ok = rc == 0 and passes(json.loads(apath.read_text()))
        except (OSError, KeyError, ValueError) as ex:
            results[tool] = {"ok": False, "exit": rc,
                             "artifact_error": repr(ex)}
            continue
        results[tool] = {"ok": ok, "exit": rc,
                         "artifact": f"tools/{tool.upper()}_r{rnd}.json"}

    rc, _ = _run(["tools/audit_rounding.py", "--all"])
    results["audit_rounding"] = {
        "ok": rc == 0, "exit": rc, "artifact": "tools/ROUNDING_AUDIT.json"
    }

    if skip_parity:
        results["scale_parity_sweep"] = {"ok": None, "skipped": True}
    else:
        rc, _ = _run(["tools/scale_parity_sweep.py", sf_parity, rnd])
        results["scale_parity_sweep"] = {
            "ok": rc == 0, "exit": rc,
            "artifact": f"tools/SCALE_PARITY_SWEEP_r{rnd}.json",
        }

    all_ok = all(r["ok"] for r in results.values() if r["ok"] is not None)
    out = {
        "round": rnd,
        "what": (
            "Round-start standing-gate run (tools/run_gates.py): all "
            "six gates as one go/no-go record. Any not-ok entry is a "
            "regression to adjudicate in-round, never a known-benign "
            "queue (the per-tool artifacts carry the details)."
        ),
        "all_ok": all_ok,
        "wall_s": round(time.time() - t0, 1),
        "gates": results,
    }
    path = REPO / "tools" / f"GATES_r{rnd}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=False))
    print(f"wrote {path}: all_ok={all_ok} "
          f"({sum(1 for r in results.values() if r['ok'])} ok, "
          f"{sum(1 for r in results.values() if r['ok'] is False)} "
          f"failed, "
          f"{sum(1 for r in results.values() if r['ok'] is None)} "
          f"skipped)")
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
