"""Runtime Bloom-filter join pruning (the Spark 3.3+ semi-join
reduction): with the optimizer confs on, a selective dim filter
injects `bloom_filter_agg` on the build side and a `might_contain`
filter on the fact scan — rows that cannot join are dropped BEFORE
the shuffle. At 100 TB this is the difference between shuffling the
whole fact table and shuffling the ~join-surviving fraction.

The injection thresholds (applicationSideScanSizeThreshold defaults
to 10GB) make this a no-op at test scale, so the capability is
proven here with conf overrides (saved/restored — the shared test
session must not leak them) rather than in a registry query: results
must equal the plain join, and the optimized plan must carry the
bloom expressions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
        "100MB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_confs(spark):
    saved = {}
    for k, v in CONFS.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_bloom_filter_injected_and_exact(spark, sf_dir, bloom_confs):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").where(
        F.col("o_totalprice") > 450000
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().optimizedPlan().toString()
    assert "might_contain" in plan, "bloom filter not injected"
    assert "bloom_filter_agg" in plan
    got = {(r.o_orderpriority, r.n) for r in j.collect()}
    # ground truth without the optimization
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    want = {
        (r.o_orderpriority, r.n)
        for r in (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
    }
    assert got == want
