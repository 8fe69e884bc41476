"""Standing gate 6: full-registry cross-engine parity at sf0.1.

Runs tools/check_oracle.py (the driver-identical t2 comparison:
rowcount + columns + order-insensitive canonicalized values) over ALL
registered queries at 10x the driver-gated scale and writes
tools/SCALE_PARITY_SWEEP_r{N}.json.

Why this is a gate of its own: the sf0.01 gate is blind by
construction to scale-dependent correctness classes. Its first full
run (r16) found two real ones, both invisible at sf0.01:

- cross-engine ROUNDING-PRIMITIVE divergence on exact half-boundaries
  (dsir_importance_weights: one sf0.1 doc's exact-1e-6-grid sum landed
  on a 4dp half-boundary where DuckDB's multiply-shift round and Java's
  BigDecimal round disagree on the IDENTICAL double);
- PLAN-TEXT precision loss (explain_cbo_stats parsed EXPLAIN COST's
  3-significant-digit rendering; lossless at sf0.01's small counts,
  wrong by 3 rows at sf0.1).

The order-fuzz audit cannot see either class (it compares Spark to
Spark); this sweep is the standing detector. Run it at round start
alongside scan/subtree/runtime/bnlj/rounding; any FAIL is a
regression to fix in-round, never a known-benign queue.

Usage::

    python tools/scale_parity_sweep.py [sf_dir] [round] [name ...]

Extra names are forwarded to check_oracle for a targeted partial
sweep; the artifact then records n_checked < 494 and is a recheck
record, not the standing gate.

Defaults: /root/testdata/sf0.1, round from the newest
CORRECTNESS_r*.json at the repo root plus one (the round being built).
Budget note: the full 494-name sf0.1 sweep takes ~25-35 min on this
box (one Spark action + one DuckDB query per name); run it once per
round on end-of-round code, or pass names through to check_oracle
directly for a targeted recheck.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _default_round() -> str:
    rounds = [
        int(m.group(1))
        for p in REPO.glob("CORRECTNESS_r*.json")
        if (m := re.match(r"CORRECTNESS_r(\d+)\.json$", p.name))
    ]
    return str(max(rounds) + 1) if rounds else "0"


def parse_check_oracle(stdout: str):
    """Split check_oracle stdout into (pass, fail, rows_only,
    fail_lines) name lists. A FAIL name may repeat across lines
    (spark error + value mismatch can't co-occur, but keep the parse
    defensive: names are deduped, first fail line per name kept)."""
    names_pass, names_fail, names_rows_only = [], [], []
    fail_lines = []
    for line in stdout.splitlines():
        if line.startswith("PASS "):
            names_pass.append(line.split()[1].rstrip(":"))
        elif line.startswith("FAIL "):
            name = line.split()[1].rstrip(":")
            if name not in names_fail:
                names_fail.append(name)
                fail_lines.append(line[:500])
        elif line.startswith("rows "):
            names_rows_only.append(line.split()[1].rstrip(":"))
    return names_pass, names_fail, names_rows_only, fail_lines


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rnd = sys.argv[2] if len(sys.argv) > 2 else _default_round()
    only = sys.argv[3:]
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "check_oracle.py"),
         sf_dir, *only],
        cwd=REPO,
        env={"PYTHONPATH": str(REPO), **__import__("os").environ},
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    names_pass, names_fail, names_rows_only, fail_lines = (
        parse_check_oracle(proc.stdout)
    )
    out = {
        "round": rnd,
        "what": (
            "Full-registry cross-engine parity sweep at 10x the "
            "driver-gated scale (tools/check_oracle.py: rowcount + "
            "columns + order-insensitive canonicalized values, the "
            "driver's t2 comparison). Standing detector for "
            "scale-dependent correctness classes the sf0.01 gate "
            "cannot see: cross-engine half-boundary rounding "
            "divergence and plan-text precision loss (two real r16 "
            "finds, both fixed in-round). Any FAIL is a regression "
            "to fix in-round; there is no known-benign queue."
        ),
        "sf_dir": sf_dir,
        "n_checked": len(names_pass) + len(names_fail),
        "n_pass": len(names_pass),
        "n_fail": len(names_fail),
        "n_rows_only": len(names_rows_only),
        "names_fail": names_fail,
        "fail_lines": fail_lines,
        "names_rows_only": names_rows_only,
        "check_oracle_exit": proc.returncode,
    }
    path = REPO / "tools" / f"SCALE_PARITY_SWEEP_r{rnd}.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=False))
    print(
        f"wrote {path}: {out['n_pass']} pass, {out['n_fail']} fail, "
        f"{out['n_rows_only']} rows-only"
    )
    sys.exit(1 if names_fail or proc.returncode else 0)


if __name__ == "__main__":
    main()
