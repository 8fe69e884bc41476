"""SURVEY.md §2 round-9 twenty-ninth wave (queued for the r10 window)
— distribution-level ML evaluation depth:

- ``conformal_prediction_interval`` — split-conformal calibration:
  a deterministic per-priority mean model, the calibration half's
  absolute residuals, q̂ = the ⌈0.9·(n+1)⌉-th smallest residual
  (computed by a k-row TakeOrdered probe — the WITH TIES idiom, no
  global sort), and the test half's empirical coverage — the
  finite-sample ≥90% guarantee checked in exact integer cents.
- ``quantile_treatment_effect`` — distributional causal effect:
  treated-vs-control outcome quantiles at τ ∈ {0.25, 0.5, 0.75}
  under the deterministic hash assignment, each quantile the sorted
  element at floor((n−1)·τ) on a mod-bounded sample — the QTE rows
  an ATE hides (a treatment can move the tails and not the mean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.operators.materialize import (
    checkpoint_reduced_and_release,
    persist_fact_rows,
)
from hdsp_hive_release_src_spark.queries.llm10 import CMS_P
from hdsp_hive_release_src_spark.queries.round9k import ATE_A, ATE_B
from hdsp_hive_release_src_spark.registry import query

B = F.broadcast

#: split key: even orderkeys calibrate, odd ones test; target level
#: 90% (permille).
CONF_LEVEL_PERMILLE = 900

_CONF_ORACLE = f"""
WITH s AS (
  SELECT o_orderkey % 2 AS arm, o_orderpriority AS p,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders),
model AS (
  SELECT p, CAST(sum(c) // count(*) AS BIGINT) AS mu
  FROM s WHERE arm = 0 GROUP BY p),
cal AS (
  SELECT abs(s.c - model.mu) AS r
  FROM s JOIN model ON s.p = model.p WHERE s.arm = 0),
nq AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cal,
         CAST(ceil({CONF_LEVEL_PERMILLE} / 1000.0 * (count(*) + 1))
              AS BIGINT) AS k
  FROM cal),
qhat AS (
  SELECT nq.n_cal, nq.k,
         (SELECT CAST(max(r) AS BIGINT)
          FROM (SELECT r FROM cal ORDER BY r LIMIT (SELECT k FROM nq))
         ) AS q_hat
  FROM nq),
test AS (
  SELECT abs(s.c - model.mu) AS r
  FROM s JOIN model ON s.p = model.p WHERE s.arm = 1)
SELECT qhat.n_cal,
       CAST((SELECT count(*) FROM test) AS BIGINT) AS n_test,
       qhat.q_hat AS q_hat_cents,
       CAST((SELECT sum(CASE WHEN r <= qhat.q_hat THEN 1 ELSE 0 END)
             FROM test) * 1000
            // (SELECT count(*) FROM test) AS BIGINT)
           AS coverage_permille
FROM qhat
"""


@query("conformal_prediction_interval", oracle=_CONF_ORACLE)
def conformal_prediction_interval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Split-conformal prediction: the even-key half calibrates (its
    per-priority integer-mean model and absolute residuals), q̂ is
    the ⌈0.9·(n_cal+1)⌉-th smallest calibration residual — computed
    with a k-row TakeOrdered probe + max, never a global sort — and
    the odd-key half reports empirical coverage of μ ± q̂ in exact
    permille. Conformal's finite-sample theorem guarantees coverage
    ≥ 900‰ regardless of how bad the mean model is, which the test
    suite asserts; the driver gate pins every intermediate (n, k,
    q̂, coverage) to the digit. Model and q̂ are broadcast scalars;
    the residual passes are plain scans."""
    o = Catalog(spark, sf_dir).orders
    # r12 scan-count fix: the model, calibration, q-hat probe and
    # test branches each re-scanned orders (6 measured); the narrow
    # (arm, priority, cents) projection is materialized once —
    # DISK_ONLY persist, not localCheckpoint, because it is
    # orders-ROW-sized (materialize.py discipline)
    s = persist_fact_rows(
        o.select(
            (F.col("o_orderkey") % 2).alias("arm"),
            F.col("o_orderpriority").alias("p"),
            F.round(F.col("o_totalprice") * 100)
            .cast("long")
            .alias("c"),
        )
    )
    # r13 subtree-sweep fix: the model is broadcast into BOTH the
    # calibration and test branches, each re-running the per-priority
    # aggregate over the persisted projection. Five rows — checkpoint.
    model = (
        s.where(F.col("arm") == 0)
        .groupBy("p")
        .agg(F.expr("cast(sum(c) div count(1) as bigint)").alias("mu"))
        .localCheckpoint()
    )
    cal = (
        s.where(F.col("arm") == 0)
        .join(B(model), "p")
        .select(F.abs(F.col("c") - F.col("mu")).alias("r"))
    )
    nq = cal.agg(
        F.count(F.lit(1)).cast("long").alias("n_cal"),
        F.expr(
            f"cast(ceil({CONF_LEVEL_PERMILLE} / 1000.0 * (count(1) + 1))"
            " as bigint)"
        ).alias("k"),
    )
    k = nq.collect()[0].k  # scalar rank — the kmeans-codebook collect
    q_hat = (
        cal.orderBy("r")
        .limit(int(k))
        .agg(F.max("r").cast("long").alias("q_hat"))
    )
    test = (
        s.where(F.col("arm") == 1)
        .join(B(model), "p")
        .select(F.abs(F.col("c") - F.col("mu")).alias("r"))
    )
    cov = (
        test.crossJoin(B(q_hat))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.expr(
                "cast(sum(case when r <= q_hat then 1 else 0 end)"
                " * 1000 div count(1) as bigint)"
            ).alias("coverage_permille"),
            F.max("q_hat").cast("long").alias("q_hat_cents"),
        )
    )
    # r14 hygiene: the 1-row result is checkpointed off the cache and
    # the orders-row persist released — no session-lifetime cache,
    # executed scans unchanged
    return checkpoint_reduced_and_release(
        nq.select("n_cal")
        .crossJoin(B(cov))
        .select("n_cal", "n_test", "q_hat_cents", "coverage_permille"),
        s,
    )


#: outcome sample bound (the KLL discipline: per-arm sorted lists
#: stay small at every test scale) and the probed quantile grid.
QTE_MOD = 7
QTE_TAUS = (250, 500, 750)


def _qte_pick(tau: int) -> str:
    # sorted element at floor((n-1) * tau / 1000), 1-based list index
    return f"CAST(floor((n - 1) * {tau} / 1000.0) AS INT) + 1"


_QTE_ORACLE = f"""
WITH s AS (
  SELECT (({ATE_A} * user_id + {ATE_B}) % {CMS_P}) % 2 AS t,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
  WHERE event_type = 'purchase' AND event_id % {QTE_MOD} = 0),
g AS (
  SELECT t, CAST(count(*) AS BIGINT) AS n, list_sort(list(c)) AS vs
  FROM s GROUP BY t),
q AS (
  SELECT tau,
         max(CASE WHEN t = 1 THEN q_v END) AS q_treat,
         max(CASE WHEN t = 0 THEN q_v END) AS q_ctrl
  FROM (
    SELECT t, 250 AS tau, vs[{_qte_pick(250)}] AS q_v FROM g
    UNION ALL
    SELECT t, 500, vs[{_qte_pick(500)}] FROM g
    UNION ALL
    SELECT t, 750, vs[{_qte_pick(750)}] FROM g)
  GROUP BY tau)
SELECT CAST(tau AS BIGINT) AS tau_permille,
       CAST(q_treat AS BIGINT) AS q_treat_cents,
       CAST(q_ctrl AS BIGINT) AS q_ctrl_cents,
       CAST(q_treat - q_ctrl AS BIGINT) AS qte_cents
FROM q ORDER BY tau_permille
"""


@query("quantile_treatment_effect", oracle=_QTE_ORACLE)
def quantile_treatment_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile treatment effects at the quartiles: the same
    deterministic hash assignment as stratified_ate_gcomputation,
    but comparing the ARMS' OUTCOME QUANTILES — the distributional
    view an average effect hides (a treatment that stretches the
    upper tail and squeezes the lower can have ATE ≈ 0 and large
    QTE). Each quantile is the sorted element at floor((n−1)·τ) of a
    mod-bounded purchase sample (two arms × bounded list — the
    documented sorted-list regime; at production scale swap in the
    KLL sketch or exact_ntile). Exact integer cents end to end."""
    ev = Catalog(spark, sf_dir).events
    s = ev.where(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") % QTE_MOD == 0)
    ).select(
        ((F.lit(ATE_A) * F.col("user_id") + ATE_B) % CMS_P % 2).alias(
            "t"
        ),
        F.round(F.col("value") * 100).cast("long").alias("c"),
    )
    # r12 scan-count fix: each quantile's select re-ran the sample
    # collect from parquet (3 scans measured); the 2-row arm table is
    # checkpointed once
    g = (
        s.groupBy("t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sort_array(F.collect_list("c")).alias("vs"),
        )
        .localCheckpoint()
    )
    rows = []
    for tau in QTE_TAUS:
        rows.append(
            g.select(
                F.lit(tau).cast("long").alias("tau_permille"),
                "t",
                F.expr(
                    f"vs[cast(floor((n - 1) * {tau} / 1000.0) as int)]"
                ).alias("q_v"),
            )
        )
    u = rows[0].unionByName(rows[1]).unionByName(rows[2])
    piv = u.groupBy("tau_permille").agg(
        F.max(F.when(F.col("t") == 1, F.col("q_v")))
        .cast("long")
        .alias("q_treat_cents"),
        F.max(F.when(F.col("t") == 0, F.col("q_v")))
        .cast("long")
        .alias("q_ctrl_cents"),
    )
    return piv.select(
        "tau_permille",
        "q_treat_cents",
        "q_ctrl_cents",
        (F.col("q_treat_cents") - F.col("q_ctrl_cents"))
        .cast("long")
        .alias("qte_cents"),
    ).orderBy("tau_permille")
