"""Round-9 twenty-fourth-wave properties: hyperbolic identities and
Python-math lockstep."""

from __future__ import annotations

import math

import pytest

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_hyperbolic_matrix_matches_python_math(spark):
    rows = sorted(
        registry.QUERIES["hyperbolic_trig_matrix"](spark, SF).collect(),
        key=lambda r: r.x,
    )
    assert len(rows) == 50  # the full quantity grid 0.1 .. 5.0
    for r in rows:
        x = r.x
        assert r.sinh_v == round(math.sinh(x), 6), x
        assert r.cosh_v == round(math.cosh(x), 6), x
        assert r.tanh_v == round(math.tanh(x), 6), x
        assert r.asinh_v == round(math.asinh(x), 6), x
        assert r.acosh_v == round(math.acosh(x + 1), 6), x
        assert r.atanh_v == round(math.atanh(1 / (x + 1)), 6), x
        assert r.atan_v == round(math.atan(x), 6), x
        assert r.atan2_v == round(math.atan2(x, 2.0), 6), x
        assert r.csc_v == round(1 / math.sin(x), 6), x
        assert r.sec_v == round(1 / math.cos(x), 6), x
        assert r.identity_v == 1.0, x  # cosh² − sinh² ≡ 1
