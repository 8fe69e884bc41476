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


def test_certification_map_is_regenerated():
    """certification.LAST_CERTIFIED must match the CORRECTNESS files
    on disk — if this fails a new driver round landed; run
    `python tools/gen_certification.py` to refresh the rotation.

    The newest round's file is allowed to be absent from the map: the
    driver writes CORRECTNESS_r{N} at the END of round N (after the
    builder's last commit), so the map legitimately lags by exactly
    one round until the next builder session regenerates it. Two
    rounds stale is a real failure."""
    from hdsp_hive_release_src_spark.certification import LAST_CERTIFIED
    from tools.gen_certification import build

    n_files = len(list(REPO.glob("CORRECTNESS_r*.json")))
    assert LAST_CERTIFIED in (build(n_files), build(n_files - 1))


def test_rotation_recycles_stalest_first():
    """Beyond the changed/never-certified prefix, the walk order must
    ascend by last-certified round — oldest certifications recycle
    into the driver window first (the standing rotation policy)."""
    from hdsp_hive_release_src_spark import registry
    from hdsp_hive_release_src_spark.certification import LAST_CERTIFIED

    registry.load_all()
    prefix = len(registry._CHANGED_THIS_ROUND) + len(
        registry._NEVER_CERTIFIED
    )
    tail = registry._VERIFY_FIRST[prefix:]
    rounds = [LAST_CERTIFIED[n] for n in tail]
    assert rounds == sorted(rounds)
    # and the full order covers the whole registry exactly once
    assert set(registry._VERIFY_FIRST) == set(registry.QUERIES)
