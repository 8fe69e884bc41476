"""Pin the gate-runner's cheap logic (tools/run_gates.py).

The six-gate run itself is a round-start activity (~35-60 min); these
tests pin what must not drift silently between rounds: the pinned
scan-sweep baseline staying in sync with the committed artifact, and
the stdout parse / gate criteria that turn tool output into the
go/no-go record.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from run_gates import KNOWN_SCAN_FLAGGED  # noqa: E402


class TestScanBaseline:
    def test_pin_matches_committed_artifact(self):
        """The runner's 9-name pin and the newest committed
        SCAN_SWEEP artifact must name the same set — updating one
        without the other would make the gate lie in one direction."""
        newest = max(
            REPO.glob("tools/SCAN_SWEEP_r*.json"),
            key=lambda p: int("".join(c for c in p.stem if c.isdigit())),
        )
        artifact = json.loads(newest.read_text())
        assert set(artifact["flagged"]) == KNOWN_SCAN_FLAGGED

    def test_both_directions_gate(self):
        """A NEW flagged name and a DISAPPEARED pinned name both fail
        the gate — a vanished flag means a plan changed without
        adjudication just as much as a new one does."""
        import run_gates

        known = run_gates.KNOWN_SCAN_FLAGGED
        flagged_extra = {n: "x" for n in known} | {"brand_new": "x"}
        flagged_missing = {n: "x" for n in sorted(known)[:-1]}
        new = sorted(set(flagged_extra) - known)
        gone = sorted(known - set(flagged_extra))
        assert new == ["brand_new"] and gone == []
        new2 = sorted(set(flagged_missing) - known)
        gone2 = sorted(known - set(flagged_missing))
        assert new2 == [] and len(gone2) == 1


class TestArtifactCriteria:
    def test_runtime_sweep_criterion_matches_artifact_shape(self):
        """The runtime gate keys (n_actionable /
        n_retained_cache_actionable / errors) must exist in the real
        committed artifact — a key rename would make the lambda
        KeyError into ok=False noise instead of evaluating."""
        artifact = json.loads(
            (REPO / "tools" / "RUNTIME_SWEEP_r16.json").read_text()
        )
        assert artifact["n_actionable"] == 0
        assert artifact["n_retained_cache_actionable"] == 0
        assert not artifact["errors"]  # empty dict of name -> error

    def test_subtree_and_bnlj_criteria_match_artifact_shape(self):
        sub = json.loads(
            (REPO / "tools" / "SUBTREE_SWEEP_r16.json").read_text()
        )
        bnlj = json.loads(
            (REPO / "tools" / "BNLJ_AUDIT_r16.json").read_text()
        )
        assert sub["n_flagged"] == 0
        assert bnlj["n_actionable"] == 0
