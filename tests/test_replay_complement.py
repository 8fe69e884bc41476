"""Guard for the replay-complement audit (r11 verdict item 5): every
registry query either appears in a tests/test_independent_replays*
batch, or is classified in tools/REPLAY_COMPLEMENT.json as
replayed-elsewhere (with the file verified to reference it) or exempt
with a reason category. A new query lands either with a replay or with
a deliberate, committed exemption — never silently unaudited."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

VALID_CATEGORIES = {
    "builtin-parity",
    "relational-parity",
    "ddl-catalog",
    "io-roundtrip",
    "engine-contract",
    "pandas-engine",
    "sketch-contract",
    "oracle-is-ground-truth",
    "property-complete",
    "deterministic-hash",
    "streaming-emit-contract",
}


def _committed() -> dict:
    return json.loads(
        (REPO / "tools" / "REPLAY_COMPLEMENT.json").read_text()
    )


def test_complement_is_exhaustive_and_current():
    from tools.replay_complement import complement

    live = set(complement())
    entries = _committed()["entries"]
    missing = sorted(live - set(entries))
    stale = sorted(set(entries) - live)
    assert not missing, (
        f"queries with no replay batch and no committed classification"
        f" (run tools/replay_complement.py): {missing}"
    )
    assert not stale, (
        f"classified names that now HAVE a replay batch (or left the"
        f" registry) - regenerate: {stale}"
    )


def _executes_query(text: str, name: str) -> bool:
    """True iff the file contains an EXECUTION-anchored reference to
    the query — not a mere substring (r13 advice: a test NAMED
    test_funnel_counts_* that replays a different query satisfied the
    old check). Accepted anchors: a direct registry index
    QUERIES["name"], a direct call name(spark…) of the imported query
    function, or the quoted name in a collection driven through a
    QUERIES[...] loop in the same file."""
    import re

    esc = re.escape(name)
    if re.search(rf'QUERIES\[\s*["\']{esc}["\']\s*\]', text):
        return True
    if re.search(rf"\b{esc}\(", text):
        return True
    return bool(
        re.search(rf'["\']{esc}["\']', text)
        and re.search(r"QUERIES\[", text)
    )


def test_every_entry_is_well_formed():
    entries = _committed()["entries"]
    for name, e in entries.items():
        if e["status"] == "replayed-elsewhere":
            where = REPO / e["where"]
            assert where.exists(), f"{name}: {e['where']} missing"
            assert _executes_query(where.read_text(), name), (
                f"{name}: {e['where']} does not EXECUTE the query "
                f"(no QUERIES[...] index, direct call, or quoted "
                f"name in a QUERIES loop) — a name substring is not "
                f"an independent-model test"
            )
        else:
            assert e["status"] == "exempt", name
            assert e["category"] in VALID_CATEGORIES, (
                f"{name}: unknown category {e.get('category')}"
            )
            assert e["reason"], f"{name}: empty reason"
