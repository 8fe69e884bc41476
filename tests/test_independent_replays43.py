"""Independent-model replays, batch 43 (round 13): the two names the
r12 replay-complement audit carried as 'replayed-elsewhere' on a
substring match that didn't hold up (the r13 advice item —
``funnel_counts`` matched only the NAME of the funnel_pattern_match
test; ``time_weighted_avg``'s property test replays the formula on
synthetic data but never executes the registry query). Both now get
real third-engine replays on the gate corpus, and the complement
guard requires an execution-anchored reference for every
replayed-elsewhere entry."""

from __future__ import annotations

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["us"] = ev.ts.values.astype("datetime64[us]").astype("int64")
    return ev


def test_funnel_counts_vs_dict_replay(spark):
    """First-touch ordered funnel rebuilt with plain dicts: per user
    the MIN event-time per stage, then strict t_view < t_click <
    t_purchase gating — no pandas groupby, no SQL."""
    registry.load_all()
    got = registry.QUERIES["funnel_counts"](spark, SF).collect()[0]
    firsts: dict[int, dict[str, int]] = {}
    for r in _events().itertuples():
        if r.event_type not in ("view", "click", "purchase"):
            continue
        d = firsts.setdefault(r.user_id, {})
        if r.event_type not in d or r.us < d[r.event_type]:
            d[r.event_type] = r.us
    n1 = n2 = n3 = 0
    for d in firsts.values():
        if "view" not in d:
            continue
        n1 += 1
        if d.get("click", -1) > d["view"]:
            n2 += 1
            if d.get("purchase", -1) > d["click"]:
                n3 += 1
    assert (got.n_view, got.n_view_click, got.n_view_click_purchase) \
        == (n1, n2, n3)


def test_time_weighted_avg_vs_pandas_replay(spark):
    """TWA on the real gate corpus recomputed in pandas: per-user
    sort by (ts, event_id), holding duration = next ts − ts, zero /
    trailing intervals dropped, Σ(v·dur)/Σdur. The hypothesis
    property test (test_properties.py) covers the formula on
    synthetic data; this executes the REGISTRY query end-to-end."""
    registry.load_all()
    got = {
        r.user_id: (r.twa, r.n_intervals)
        for r in registry.QUERIES["time_weighted_avg"](
            spark, SF
        ).collect()
    }
    ev = _events()
    ev = ev[ev.user_id < 50].sort_values(["user_id", "us", "event_id"])
    want: dict[int, tuple[float, int]] = {}
    for uid, g in ev.groupby("user_id"):
        dur = g.us.shift(-1) - g.us
        mask = dur.notna() & (dur > 0)
        if not mask.any():
            continue
        num = float((g.value[mask] * dur[mask]).sum())
        den = float(dur[mask].sum())
        want[int(uid)] = (num / den, int(mask.sum()))
    assert set(got) == set(want)
    for uid, (twa, n) in got.items():
        raw, n_want = want[uid]
        assert n == n_want, uid
        # query rounds to 6 — allow the half-ulp of that rounding
        assert abs(twa - raw) <= 5e-7, (uid, twa, raw)
