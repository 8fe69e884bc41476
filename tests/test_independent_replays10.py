"""Independent-model replays, batch 10 (round 11): the legacy stats /
graph cluster whose DuckDB oracles replay the SAME hand-derived
formulas as the Spark plans (moments, chi-square, Benford, MAD,
weighted median, HHI, z-scores, entropy, unrolled PageRank/BFS
rounds). A pure-Python third engine breaks the shared-derivation
symmetry: an implementation and oracle that are consistently wrong
together (the Bollinger lesson) cannot pass these.

Tolerances: query outputs are rounded to k decimals, so
|rounded − raw| ≤ 0.5·10⁻ᵏ; asserts allow 0.6·10⁻ᵏ against the
unrounded Python value (plus nothing else — the replay's own float
error on these magnitudes is ~1e-12 relative)."""

from __future__ import annotations

import math
import statistics
from collections import defaultdict, deque

import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 6e-7
TOL4 = 6e-5


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_skewness_kurtosis_population_moments(spark):
    registry.load_all()
    rows = registry.QUERIES["skewness_kurtosis_moments"](
        spark, SF
    ).collect()
    li = _tbl("lineitem")
    for r in rows:
        xs = li.loc[li.l_returnflag == r.grp, "l_extendedprice"]
        m = xs.mean()
        m2 = ((xs - m) ** 2).mean()
        m3 = ((xs - m) ** 3).mean()
        m4 = ((xs - m) ** 4).mean()
        assert abs(r.skew - m3 / m2**1.5) <= TOL6, r.grp
        assert abs(r.kurt - (m4 / m2**2 - 3)) <= TOL6, r.grp


def test_chi_square_contingency_replay(spark):
    registry.load_all()
    row = registry.QUERIES["chi_square_independence"](
        spark, SF
    ).collect()[0]
    ev = _tbl("events")
    obs: dict[tuple, int] = defaultdict(int)
    for t, u in zip(ev.event_type, ev.user_id):
        obs[(t, int(u) % 4)] += 1
    rt: dict = defaultdict(int)
    ct: dict = defaultdict(int)
    for (rr, cc), o in obs.items():
        rt[rr] += o
        ct[cc] += o
    total = sum(obs.values())
    chi2 = sum(
        (o - rt[rr] * ct[cc] / total) ** 2 / (rt[rr] * ct[cc] / total)
        for (rr, cc), o in obs.items()
    )
    assert abs(row.chi2 - chi2) <= TOL4
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)


def test_benford_leading_digit_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["benford_distribution"](spark, SF).collect()
    o = _tbl("orders")
    counts: dict[int, int] = defaultdict(int)
    for v in o.o_totalprice:
        v = float(v)
        if v > 0:
            # the same float derivation both engines use — no strings
            counts[int(v // 10 ** math.floor(math.log10(v)))] += 1
    total = sum(counts.values())
    assert [r.digit for r in rows] == sorted(counts)
    for r in rows:
        assert r.n == counts[r.digit]
        freq = counts[r.digit] / total
        ben = math.log10(1 + 1 / r.digit)
        assert abs(r.observed_freq - freq) <= TOL6
        assert abs(r.benford_freq - ben) <= TOL6
        assert abs(r.abs_dev - abs(freq - ben)) <= TOL6


def test_mad_outlier_fences_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["mad_outliers"](spark, SF).collect()
    ev = _tbl("events")
    for r in rows:
        xs = [float(v) for v in ev.loc[ev.event_type == r.event_type, "value"]]
        med = statistics.median(xs)
        adev = [abs(x - med) for x in xs]
        mad = statistics.median(adev)
        assert abs(r.median_value - med) <= TOL4
        assert abs(r.mad - mad) <= TOL4
        assert r.n_outliers == sum(
            1 for a in adev if a > 3 * 1.4826 * mad
        )


def test_weighted_median_cumulative_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["weighted_median"](spark, SF).collect()
    o = _tbl("orders")
    o = o[o.o_orderkey < 5000]
    for r in rows:
        g = o[o.o_orderpriority == r.grp].sort_values(
            ["o_totalprice", "o_orderkey"]
        )
        wts = (g.o_orderkey % 5 + 1).tolist()
        vs = g.o_totalprice.tolist()
        tw = sum(wts)
        cw = 0
        for v, w in zip(vs, wts):
            cw += w
            if cw * 2 >= tw:
                assert abs(r.weighted_median - v) <= TOL4, r.grp
                break


def test_trimmed_mean_order_stats_replay(spark):
    registry.load_all()
    row = registry.QUERIES["trimmed_mean"](spark, SF).collect()[0]
    o = _tbl("orders").sort_values(["o_totalprice", "o_orderkey"])
    n = len(o)
    cut = n // 20
    cents = [
        int(round(v * 100)) for v in o.o_totalprice.iloc[cut : n - cut]
    ]
    assert row.n_kept == len(cents)
    assert row.cents_sum == sum(cents)
    assert abs(row.trimmed_mean - sum(cents) / 100 / len(cents)) <= TOL4


def test_zscore_outliers_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["zscore_outliers"](spark, SF).collect()
    o = _tbl("orders")
    for r in rows:
        xs = [
            float(v)
            for v in o.loc[o.o_orderpriority == r.grp, "o_totalprice"]
        ]
        mu = sum(xs) / len(xs)
        sigma = statistics.stdev(xs)
        zs = [abs((x - mu) / sigma) for x in xs]
        assert r.n_rows == len(xs)
        assert r.n_outliers == sum(1 for z in zs if z > 2.5)
        assert abs(r.max_z - max(zs)) <= TOL4


def test_hhi_share_squares_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["supplier_concentration_hhi"](
        spark, SF
    ).collect()
    li = _tbl("lineitem")
    p = _tbl("part")[["p_partkey", "p_type"]]
    j = li.merge(p, left_on="l_partkey", right_on="p_partkey")
    cells = (
        j.groupby(["p_type", "l_suppkey"])["l_extendedprice"]
        .sum()
        .reset_index()
    )
    for r in rows:
        revs = cells.loc[
            cells.p_type == r.p_type, "l_extendedprice"
        ].tolist()
        t = sum(revs)
        assert r.n_suppliers == len(revs)
        assert abs(r.hhi - sum((v / t) ** 2 for v in revs)) <= TOL6


def test_distribution_entropy_replay(spark):
    registry.load_all()
    row = registry.QUERIES["distribution_entropy"](spark, SF).collect()[0]
    d = _tbl("documents")
    counts = d.lang.value_counts()
    probs = [c / counts.sum() for c in counts]
    ent = -sum(p * math.log(p) for p in probs) / math.log(2)
    assert row.n_classes == len(probs)
    assert abs(row.entropy_bits - ent) <= TOL6
    assert abs(row.gini - (1 - sum(p * p for p in probs))) <= TOL6


def test_mode_deterministic_tiebreak_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["mode_deterministic"](spark, SF).collect()
    c = _tbl("customer")
    for r in rows:
        seg = c[c.c_mktsegment == r.c_mktsegment]
        counts = seg.c_nationkey.value_counts()
        best_n = counts.max()
        # highest frequency, lowest value wins ties
        best_k = min(int(k) for k, v in counts.items() if v == best_n)
        assert (r.mode_nation, r.mode_count) == (best_k, best_n)


def _trade_graph():
    o = _tbl("orders")
    li = _tbl("lineitem")
    j = o.loc[o.o_custkey < 60, ["o_orderkey", "o_custkey"]].merge(
        li[["l_orderkey", "l_suppkey"]],
        left_on="o_orderkey",
        right_on="l_orderkey",
    )
    pairs = {
        (f"c{c}", f"s{s}")
        for c, s in zip(j.o_custkey, j.l_suppkey)
    }
    edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    return pairs, edges


def test_pagerank_power_iteration_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["pagerank_trade_graph"](spark, SF).collect()
    _, edges = _trade_graph()
    outd: dict = defaultdict(int)
    for a, _ in edges:
        outd[a] += 1
    rank = {n: 1.0 for n in outd}
    for _ in range(3):
        nxt: dict = defaultdict(float)
        for a, b in edges:
            nxt[b] += rank[a] / outd[a]
        rank = {n: 0.15 + 0.85 * v for n, v in nxt.items()}
    got = {r.node: r.rank for r in rows}
    assert set(got) == set(rank)
    for n, v in rank.items():
        assert abs(got[n] - v) <= TOL6, n


def test_bfs_level_bounded_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["shortest_path_bfs"](spark, SF).collect()
    pairs, edges = _trade_graph()
    adj: dict = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
    src = "c" + str(min(int(a[1:]) for a, _ in pairs))
    dist = {src: 0}
    q = deque([src])
    while q:
        n = q.popleft()
        if dist[n] >= 4:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    got = {r.node: r.dist for r in rows}
    assert got == dist
