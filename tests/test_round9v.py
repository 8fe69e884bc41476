"""Round-9 twenty-second-wave properties: try-conversion NULL
pattern and UTF-8 repair."""

from __future__ import annotations

import pytest

from hdsp_hive_release_src_spark import registry

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def _load():
    registry.load_all()


def test_try_conversion_null_pattern(spark):
    row = registry.QUERIES["try_conversion_matrix"](
        spark, SF
    ).collect()[0]
    assert row.bad_date_is_null is True
    assert str(row.ok_date) == "2024-02-29"
    assert row.ok_num == 12345 and row.bad_num is None
    assert row.mod_zero is None and row.mod_three == 1
    assert row.url_host == "spark.apache.org"
    assert row.url_path == "/path"
    assert row.bad_url_host is None
    assert row.url_decoded == "a b!" and row.bad_url_decoded is None
    assert row.hex_roundtrip == "deadbeef" and row.bad_hex is None
    assert row.utf8_valid is True and row.utf8_invalid is False
    assert row.utf8_repaired == "A�B"  # U+FFFD repair
    assert row.eq_null_both is True and row.eq_null_one is False
    assert (row.nvl2_notnull, row.nvl2_null) == ("a", "b")
    assert row.ifnull_v == 7
    assert row.nullifzero_v is None and row.zeroifnull_v == 0
    assert row.typeof_arr == "array<int>"
