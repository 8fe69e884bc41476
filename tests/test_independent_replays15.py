"""Independent-model replays, batch 15 (round 11): the embedding /
similarity-search cluster replayed in numpy — the shipped plans fold
dot products with JVM higher-order lambdas and the oracles with
DuckDB list_transform, both from my formulas; numpy's BLAS path is a
third arithmetic engine. Includes a full from-scratch IVF replay
(centroid assignment → probe selection → cell-restricted scoring)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"
TOL6 = 1.2e-6


def _emb() -> pd.DataFrame:
    df = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    df["v"] = df.embedding.map(lambda a: np.asarray(a, dtype=np.float64))
    return df


def _r6(x: float) -> float:  # HALF_UP (away from zero), Spark round()
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)


def test_cosine_pairs_numpy_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["embedding_cosine_pairs"](spark, SF).collect()
    e = _emb()
    M = np.stack(e.v.to_list())
    ids = e.vec_id.astype(int).to_list()
    nrm = np.linalg.norm(M, axis=1)
    cos = (M @ M.T) / np.outer(nrm, nrm)
    want = {}
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a, b = sorted((ids[i], ids[j]))
            c = _r6(cos[i, j])
            if c >= 0.45:
                want[(a, b)] = c
    got = {(r.v1, r.v2): r.cos for r in rows}
    assert set(got) == set(want)
    for k, c in got.items():
        assert abs(c - want[k]) <= TOL6


def test_ann_bruteforce_topk_numpy_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["ann_bruteforce_topk"](spark, SF).collect()
    e = _emb()
    ids = e.vec_id.astype(int).to_list()
    M = np.stack(e.v.to_list())
    nrm = np.linalg.norm(M, axis=1)
    idx = {v: i for i, v in enumerate(ids)}
    want = []
    for q in sorted(v for v in ids if v < 5):
        qi = idx[q]
        scored = sorted(
            (
                (-_r6(float(M[qi] @ M[i]) / (nrm[qi] * nrm[i])), v)
                for v, i in idx.items()
                if v != q
            ),
        )[:10]
        for rank, (negc, v) in enumerate(scored, 1):
            want.append((q, v, -negc, rank))
    got = [(r.query_id, r.neighbor_id, r.cos, r.rank) for r in rows]
    assert [(g[0], g[1], g[3]) for g in got] == [
        (w[0], w[1], w[3]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) <= TOL6


def test_ann_ivf_numpy_full_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["ann_ivf_topk"](spark, SF).collect()
    e = _emb()
    ids = e.vec_id.astype(int).to_list()
    M = np.stack(e.v.to_list())
    nrm = np.linalg.norm(M, axis=1)
    idx = {v: i for i, v in enumerate(ids)}
    cents = sorted(v for v in ids if v % 25 == 0)

    def cos(a: int, b: int) -> float:
        return _r6(float(M[idx[a]] @ M[idx[b]]) / (nrm[idx[a]] * nrm[idx[b]]))

    # cell assignment: best centroid by (rounded cos desc, cid asc)
    assigned = {
        v: max(cents, key=lambda c: (cos(v, c), -c)) for v in ids
    }
    want = []
    for q in sorted(v for v in ids if v < 5):
        probes = sorted(cents, key=lambda c: (-cos(q, c), c))[:3]
        cands = [
            v for v in ids if assigned[v] in probes and v != q
        ]
        top = sorted(cands, key=lambda v: (-cos(q, v), v))[:10]
        for rank, v in enumerate(top, 1):
            want.append((q, v, cos(q, v), rank))
    got = [(r.query_id, r.neighbor_id, r.cos, r.rank) for r in rows]
    assert [(g[0], g[1], g[3]) for g in got] == [
        (w[0], w[1], w[3]) for w in want
    ]
    for g, w in zip(got, want):
        assert abs(g[2] - w[2]) <= TOL6


def test_embedding_centroids_numpy_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["embedding_centroids"](spark, SF).collect()
    e = _emb()
    want = {}
    for lbl, g in e.groupby("label"):
        M = np.stack(g.v.to_list())
        mean = M.mean(axis=0)
        for d in range(8):
            want[(lbl, d)] = (float(mean[d]), len(g))
    got = {
        (r.label, r.dim): (r.centroid_val, r.n_vecs) for r in rows
    }
    assert set(got) == set(want)
    for k, (cv, n) in got.items():
        assert n == want[k][1]
        assert abs(cv - want[k][0]) <= TOL6


def test_embedding_norm_outliers_numpy_replay(spark):
    registry.load_all()
    row = registry.QUERIES["embedding_norm_outliers"](spark, SF).collect()[0]
    e = _emb()
    nrm = np.linalg.norm(np.stack(e.v.to_list()), axis=1)
    mu = nrm.mean()
    sd = nrm.std(ddof=1)
    assert row.n_vectors == len(nrm)
    assert abs(row.mean_norm - mu) <= TOL6
    assert abs(row.std_norm - sd) <= TOL6
    assert row.n_outliers == int((np.abs(nrm - mu) > 3 * sd).sum())
    assert row.n_zero == int((nrm < 1e-6).sum())


def test_embedding_quantize_numpy_replay(spark):
    registry.load_all()
    rows = registry.QUERIES["embedding_quantize"](spark, SF).collect()
    e = _emb()
    vecs = {
        int(v): arr for v, arr in zip(e.vec_id, e.v) if v < 500
    }
    assert len(rows) == len(vecs)
    for r in rows:
        v = vecs[r.vec_id]
        scale = np.abs(v).max() / 127.0
        q = np.sign(v) * np.floor(np.abs(v / scale) + 0.5)  # HALF_UP
        err = v - q * scale
        rmse = math.sqrt(float((err**2).sum()) / len(v))
        assert r.n_dims == len(v)
        assert abs(r.scale_r - scale) <= TOL6
        assert abs(r.rmse - rmse) <= TOL6
