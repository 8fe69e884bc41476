"""Round-9 sixth-wave properties: z-test non-degeneracy, Fano bounds,
seasonal-effect zero-sum tendency, Tukey fence ordering, Fleiss
bounds, Theil non-negativity, adversarial CSV round-trip content,
gzip file extension."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_abtest_nondegenerate(spark):
    r = registry.QUERIES["abtest_proportions_ztest"](spark, SF).collect()[0]
    assert r.na > 0 and r.nb > 0
    # the share-based rule must keep both arms off the 0%/100% rails
    assert 0 < r.xa < r.na
    assert 0 < r.xb < r.nb
    assert abs(r.z_stat) < 10


def test_fano_positive(spark):
    rows = registry.QUERIES["burstiness_fano_factor"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.fano_factor > 0
        assert r.n_days > 2


def test_seasonal_effects_near_zero_sum(spark):
    rows = registry.QUERIES["seasonal_decompose_additive"](
        spark, SF
    ).collect()
    assert len(rows) == 7
    total_days = sum(r.n_days for r in rows)
    weighted = sum(r.n_days * r.effect_millicents for r in rows)
    mean_daily = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy(F.to_date("o_orderdate"))
        .agg(
            F.sum(
                F.expr("CAST(round(o_totalprice * 100) AS BIGINT)")
            ).alias("c")
        )
        .agg(F.avg("c"))
        .collect()[0][0]
    )
    # additive effects average out to ~0 relative to daily magnitude
    assert abs(weighted / total_days) < mean_daily * 1000 * 0.05


def test_tukey_fences_ordering(spark):
    rows = registry.QUERIES["tukey_fences_grouped"](spark, SF).collect()
    for r in rows:
        assert r.q1 <= r.q3
        assert 0 <= r.n_outliers < r.n


def test_fleiss_bounds(spark):
    r = registry.QUERIES["fleiss_kappa_raters"](spark, SF).collect()[0]
    assert -1.0 <= r.fleiss_kappa <= 1.0
    assert 0 < r.sum_true < 3 * r.n_items


def test_theil_nonnegative(spark):
    r = registry.QUERIES["theil_index_inequality"](spark, SF).collect()[0]
    assert r.theil_t >= 0
    assert r.n_customers > 100


def test_csv_adversarial_roundtrip_content(spark):
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    r = registry.QUERIES["csv_write_quote_escape_matrix"](
        spark, SF
    ).collect()[0]
    n_parts = spark.read.parquet(f"{SF}/part.parquet").count()
    assert r.n == n_parts
    assert r.n_multiline == n_parts  # every row embeds a newline
    # the raw file really contains quoted embedded newlines
    path = scratch_path("csv_adv_r9", SF)
    f = next(
        os.path.join(d, x)
        for d, _, fs in os.walk(path)
        for x in fs
        if x.endswith(".csv")
    )
    body = open(f, "rb").read()
    assert b'""' in body  # doubled-quote escaping present


def test_gzip_json_files_have_gz_extension(spark):
    from hdsp_hive_release_src_spark.sources.io import scratch_path

    registry.QUERIES["json_lines_gzip_roundtrip"](spark, SF).collect()
    path = scratch_path("json_gz_r9", SF)
    files = [
        x
        for _, _, fs in os.walk(path)
        for x in fs
        if not x.startswith((".", "_"))
    ]
    assert files and all(x.endswith(".json.gz") for x in files)
