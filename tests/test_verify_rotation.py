"""Guard for the driver-verification rotation (the advisor's r5 ask):
the driver samples the FIRST 50 queries of the registry dict each
round, so every query that has never earned a driver correctness row
must appear in ``_VERIFY_FIRST`` — otherwise it can never be sampled
and stays "judge-local" forever."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

WINDOW = 50


def _driver_checked() -> set[str]:
    checked: set[str] = set()
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        checked |= set(json.loads(f.read_text()).keys())
    return checked


def test_never_checked_queries_listed_in_verify_first():
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    never = set(registry.QUERIES) - _driver_checked()
    missing = sorted(never - set(registry._VERIFY_FIRST))
    assert not missing, (
        f"queries with no driver row absent from _VERIFY_FIRST "
        f"(they can never be sampled): {missing}"
    )


def test_verify_first_is_clean():
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    vf = registry._VERIFY_FIRST
    assert len(vf) == len(set(vf)), "duplicate names in _VERIFY_FIRST"
    unknown = sorted(set(vf) - set(registry.QUERIES))
    assert not unknown, f"_VERIFY_FIRST names not registered: {unknown}"


def test_window_prefix_is_verify_first_order():
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    prefix = list(registry.QUERIES)[:WINDOW]
    assert prefix == list(registry._VERIFY_FIRST[:WINDOW])
