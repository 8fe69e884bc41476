"""Independent-model replays, batch 34 (round 11): array higher-order
folds vs numpy, population-vs-sample variance families vs moment
formulas, and the NOT IN null trap replayed with Python's own
three-valued-logic expectation."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 1.2e-6


def _tbl(name: str) -> pd.DataFrame:
    return pq.read_table(f"{SF}/{name}.parquet").to_pandas()


def test_array_folds_vs_numpy(spark):
    registry.load_all()
    rows = registry.QUERIES["array_funcs"](spark, SF).collect()
    e = _tbl("embeddings")
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(e.vec_id, e.embedding)
    }
    assert len(rows) == min(100, len(vecs))
    for r in rows:
        v = vecs[r.vec_id]
        assert abs(r.vec_sum - float(v.sum())) <= TOL6
        assert abs(r.vec_max - float(v.max())) <= TOL6
        assert abs(r.first_dim - float(v[0])) <= TOL6
        assert abs(r.l1_head - float(np.abs(v[:8]).sum())) <= TOL6
        assert r.n_positive == int((v > 0).sum())


def test_pop_vs_sample_variance_family_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["pop_variance_family"](spark, SF).collect()
    li = _tbl("lineitem")
    for r in rows:
        g = li[li.l_returnflag == r.l_returnflag]
        xs = g.l_quantity.astype(float)
        ys = g.l_linenumber.astype(float)
        n = len(xs)
        mx, my = xs.mean(), ys.mean()
        var_p = ((xs - mx) ** 2).sum() / n
        cov_p = ((xs - mx) * (ys - my)).sum() / n
        assert abs(r.var_p - var_p) <= TOL6
        assert abs(r.std_p - math.sqrt(var_p)) <= TOL6
        assert abs(r.cov_p - cov_p) <= TOL6
        assert abs(r.var_s - ((xs - mx) ** 2).sum() / (n - 1)) <= TOL6
        assert r.n == n


def test_not_in_null_trap_replay(spark):
    registry.load_all()
    row = registry.QUERIES["not_in_null_semantics"](spark, SF).collect()[0]
    c = _tbl("customer")
    o = _tbl("orders")
    sub = o[o.o_orderkey < 1000]
    keys = set(sub.o_custkey.astype(int))
    clean = sum(1 for k in c.c_custkey.astype(int) if k not in keys)
    assert row.not_in_clean == clean
    assert row.not_exists == clean  # NOT EXISTS is null-immune
    # a NULL in the subquery makes x NOT IN (...) UNKNOWN for every x
    # that isn't matched, so the count collapses to zero — unless the
    # key 999 doesn't exist, in which case no NULL is injected
    has_999 = (sub.o_orderkey == 999).any()
    assert row.not_in_with_null == (0 if has_999 else clean)
