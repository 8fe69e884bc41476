"""Property-based tests (hypothesis) for the custom operators —
random inputs, invariants checked against independent Python models
(SURVEY.md §5). Few examples per property: each example round-trips
through Spark, so the budget goes to input diversity, not volume.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

GAP_S = 1800


@st.composite
def event_times(draw):
    """Per-user lists of epoch-second offsets (may collide)."""
    n_users = draw(st.integers(1, 3))
    return {
        u: sorted(
            draw(
                st.lists(
                    st.integers(0, 10 * GAP_S), min_size=1, max_size=12
                )
            )
        )
        for u in range(n_users)
    }


def _model_sessions(times: list[int], gap_s: int = GAP_S) -> list[int]:
    """Reference implementation: 1-based session ids for sorted times."""
    out, sid = [], 0
    prev = None
    for t in times:
        if prev is None or t - prev > gap_s:
            sid += 1
        out.append(sid)
        prev = t
    return out


@SLOW
@given(event_times())
def test_sessionize_matches_model(spark, data):
    from hdsp_hive_release_src_spark.operators.sessionize import sessionize

    rows = [
        (u, i, datetime.fromtimestamp(t, tz=timezone.utc))
        for u, times in data.items()
        for i, t in enumerate(times)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts timestamp")
    got = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(df).collect()
    }
    for u, times in data.items():
        want = _model_sessions(times)
        # event_id follows the per-user sort order (ties broken by id,
        # and ids were assigned in sorted order)
        for i in range(len(times)):
            assert got[(u, i)] == want[i], (u, times, want, got)


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        min_size=1,
        max_size=30,
    ),
    st.lists(
        st.tuples(st.integers(0, 6), st.integers(0, 50)),
        min_size=1,
        max_size=30,
    ),
)
def test_salted_join_equals_plain_join(spark, left_rows, right_rows):
    from hdsp_hive_release_src_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(k, v) for k, v in left_rows], "k long, lv long"
    )
    right = spark.createDataFrame(
        [(k, v) for k, v in right_rows], "k long, rv long"
    )
    plain = sorted(
        map(tuple, left.join(right, "k").select("k", "lv", "rv").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, "k", n_salts=4, salt_src="lv")
            .select("k", "lv", "rv")
            .collect(),
        )
    )
    assert salted == plain


def test_salted_join_default_salt_spreads_hot_key(spark):
    """The default (whole-row) salt must put rows of ONE hot key into
    multiple salt buckets — hashing the key itself would give every row
    the same salt (zero spreading). Also checks result parity vs a
    plain join under the default salt."""
    from pyspark.sql import functions as F

    from hdsp_hive_release_src_spark.operators.skew import salted_join

    # one hot key (0) with 200 distinct payload rows + a few cold keys
    left = spark.createDataFrame(
        [(0, i) for i in range(200)] + [(k, 0) for k in range(1, 5)],
        "k long, lv long",
    )
    right = spark.createDataFrame([(k, k * 10) for k in range(5)], "k long, rv long")

    n_salts = 8
    salt_expr = F.pmod(F.xxhash64(F.col("k"), F.col("lv")), F.lit(n_salts))
    buckets = (
        left.where(F.col("k") == 0)
        .select(salt_expr.alias("s"))
        .distinct()
        .count()
    )
    assert buckets > 1, "hot key must land in more than one salt bucket"

    plain = sorted(
        map(tuple, left.join(right, "k").select("k", "lv", "rv").collect())
    )
    salted = sorted(
        map(
            tuple,
            salted_join(left, right, "k", n_salts=n_salts)
            .select("k", "lv", "rv")
            .collect(),
        )
    )
    assert salted == plain


@SLOW
@given(
    st.lists(st.integers(0, 1000), min_size=1, max_size=20),
    st.lists(st.integers(0, 1000), min_size=1, max_size=10),
)
def test_asof_join_matches_model(spark, left_ts, right_ts):
    """Backward as-of: each left row gets the latest right value with
    right_t <= left_t (inclusive), else null."""
    from hdsp_hive_release_src_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, datetime.fromtimestamp(t, tz=timezone.utc), i)
         for i, t in enumerate(left_ts)],
        "uid long, lt timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, datetime.fromtimestamp(t, tz=timezone.utc), t)
         for t in sorted(set(right_ts))],
        "uid long, rt timestamp, rv long",
    )
    out = asof_join(
        left, right, "lt", "rt", "uid", "uid", ["rv"]
    ).collect()
    rts = sorted(set(right_ts))
    for r in out:
        lt = int(r.lt.replace(tzinfo=timezone.utc).timestamp())
        want = max((t for t in rts if t <= lt), default=None)
        assert r.rv_right == want, (lt, rts, r.rv_right, want)
