"""kmeans operator vs an independent numpy Lloyd implementation."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def _numpy_kmeans(X, ids, k=20, iterations=3):
    import hashlib

    # seed rule shared with the operator: k smallest md5(str(id)),
    # cid = rank in that hash order (md5 here is stdlib, fully
    # independent of Spark's implementation)
    order = sorted(
        range(len(ids)),
        key=lambda i: (
            hashlib.md5(str(ids[i]).encode()).hexdigest(),
            ids[i],
        ),
    )[:k]
    cent = X[order].astype(np.float64)
    assign = None
    for it in range(iterations):
        # rank by -2 v·c + |c|²; ties -> lowest cid (argmin is first)
        d = -2 * X @ cent.T + (cent * cent).sum(axis=1)
        assign = d.argmin(axis=1)
        if it == iterations - 1:
            break
        cent = np.stack(
            [
                X[assign == c].mean(axis=0) if (assign == c).any()
                else cent[c]
                for c in range(len(cent))
            ]
        )
    return assign


def test_kmeans_matches_numpy(spark, sf_dir):
    from hdsp_hive_release_src_spark.functions.vectors import to_double
    from hdsp_hive_release_src_spark.operators.kmeans import kmeans

    e = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", to_double("embedding").alias("v"))
        .orderBy("vec_id")
    )
    rows = e.collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.v for r in rows], dtype=np.float64)

    want = _numpy_kmeans(X, ids)
    got_rows = kmeans(e).collect()
    got = {r.vec_id: r.cluster for r in got_rows}
    assert len(got) == len(ids)
    mismatch = sum(
        1 for i, vid in enumerate(ids) if got[vid] != want[i]
    )
    # exact match expected: planted clusters are well separated, so
    # float-order noise cannot flip an argmin
    assert mismatch == 0, f"{mismatch}/{len(ids)} assignments differ"


def test_kmeans_clusters_query_runs(spark, sf_dir):
    from hdsp_hive_release_src_spark import registry

    registry.load_all()
    df = registry.QUERIES["kmeans_clusters"](spark, sf_dir)
    rows = df.collect()
    assert sum(r.n_members for r in rows) == 500
    assert all(r.n_members > 0 for r in rows)
    assert df.columns == ["cluster", "n_members"]