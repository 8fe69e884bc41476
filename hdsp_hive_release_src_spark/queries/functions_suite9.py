"""SURVEY.md §2.2 round-7 function-coverage wave 7:

- ``array_access_semantics`` — element_at (1-based, negative from the
  end), try_element_at (NULL out-of-bounds), get() (0-based, NULL
  OOB), array_size.
- ``pop_variance_family`` — stddev_pop/var_pop/covar_pop over
  small-integer columns (sums stay exact in doubles, so the merged
  central-moment accumulators are fuzz-stable; verified by the
  rounding audit's partition fuzz).
- ``extract_field_matrix`` — date_part/extract over every common
  field, with the documented cross-engine DOW offset handled
  explicitly (Spark dayofweek is 1=Sunday, DuckDB dow is 0=Sunday).
- ``nondeterministic_funcs_contract`` — uuid / rand /
  monotonically_increasing_id / spark_partition_id /
  input_file_name return VALUES that are legitimately
  nondeterministic, so the query asserts their CONTRACTS (range,
  distinctness, format, file-suffix) and outputs booleans the
  literal oracle pins — the same tripwire style as
  explain_plan_surface.
- ``variant_functions_wave2`` — parse_json/try_parse_json/
  is_variant_null/schema_of_variant/variant_explode (the Spark 4
  VARIANT tool-belt beyond variant_semistructured's get-path reads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "array_access_semantics",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, string_split(o_orderpriority, '-') AS parts
      FROM orders WHERE o_orderkey < 400)
    SELECT o_orderkey,
           parts[1] AS first_el,
           parts[-1] AS last_el,
           CAST(NULL AS VARCHAR) AS oob_null,
           parts[1] AS get0,
           CAST(len(parts) AS INT) AS asz
    FROM src ORDER BY o_orderkey
    """,
)
def array_access_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array access semantics matrix: element_at is 1-based and
    accepts negative indexes (from the end); try_element_at returns
    NULL beyond the bounds instead of raising (ANSI mode raises for
    element_at — the try_ variant is the pipeline-safe form); get()
    is the 0-based accessor with NULL OOB; array_size counts. DuckDB
    mirrors with its native 1-based/negative list indexing and a NULL
    literal for the OOB lane."""
    o = Catalog(spark, sf_dir).orders
    parts = F.split("o_orderpriority", "-")
    return (
        o.where(F.col("o_orderkey") < 400)
        .select(
            "o_orderkey",
            F.element_at(parts, 1).alias("first_el"),
            F.element_at(parts, -1).alias("last_el"),
            F.try_element_at(parts, F.lit(9)).alias("oob_null"),
            F.get(parts, 0).alias("get0"),
            F.array_size(parts).alias("asz"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "pop_variance_family",
    oracle="""
    SELECT l_returnflag,
           round(var_pop(l_quantity), 6) AS var_p,
           round(stddev_pop(l_quantity), 6) AS std_p,
           round(covar_pop(l_quantity, l_linenumber), 6) AS cov_p,
           round(var_samp(l_quantity), 6) AS var_s,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def pop_variance_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-variance aggregate family (var_pop / stddev_pop /
    covar_pop, with var_samp alongside for the n-1 contrast). Inputs
    are deliberately the SMALL-INTEGER columns: quantities (1..50)
    and line numbers keep every partial sum exact in a double, so the
    merged central-moment accumulators agree across partitionings to
    far below the 6dp rounding (fuzz-checked by the rounding audit);
    a money-column variance would be the order-sensitive dsir
    class."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.var_pop("l_quantity"), 6).alias("var_p"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("std_p"),
            F.round(
                F.covar_pop("l_quantity", "l_linenumber"), 6
            ).alias("cov_p"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_s"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "extract_field_matrix",
    oracle="""
    SELECT o_orderkey,
           date_part('year', o_orderdate) AS y,
           date_part('quarter', o_orderdate) AS q,
           date_part('month', o_orderdate) AS mo,
           date_part('week', o_orderdate) AS wk,
           date_part('day', o_orderdate) AS d,
           date_part('doy', o_orderdate) AS doy,
           date_part('dow', o_orderdate) + 1 AS dow_sun1,
           date_part('hour', o_orderdate) AS h,
           date_part('minute', o_orderdate) AS mi,
           CAST(date_part('second', o_orderdate) AS BIGINT) AS s
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def extract_field_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_part / EXTRACT across the full field set in one query —
    year, quarter, month, ISO week, day, day-of-year, day-of-week,
    hour, minute, second. The one cross-engine trap is handled where
    it lives: Spark's DOW is 1=Sunday while DuckDB's is 0=Sunday, so
    the oracle shifts (+1) rather than both sides pretending the
    field agrees. Integer outputs only."""
    o = Catalog(spark, sf_dir).orders
    d = F.col("o_orderdate")
    return (
        o.where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.expr("extract(YEAR FROM o_orderdate)").cast("long").alias("y"),
            F.expr("extract(QUARTER FROM o_orderdate)").cast("long").alias("q"),
            F.expr("extract(MONTH FROM o_orderdate)").cast("long").alias("mo"),
            F.weekofyear(d).cast("long").alias("wk"),
            F.expr("extract(DAY FROM o_orderdate)").cast("long").alias("d"),
            F.dayofyear(d).cast("long").alias("doy"),
            F.dayofweek(d).cast("long").alias("dow_sun1"),
            F.hour(d).cast("long").alias("h"),
            F.minute(d).cast("long").alias("mi"),
            F.second(d).cast("long").alias("s"),
        )
        .orderBy("o_orderkey")
    )


#: expected contract outcomes, shared with the literal oracle.
_NONDET_CONTRACTS = (
    ("mid_distinct_and_increasing", True),
    ("partition_ids_in_range", True),
    ("rand_in_unit_interval", True),
    ("scanned_from_orders_parquet", True),
    ("uuids_all_distinct", True),
    ("uuids_rfc4122_format", True),
)


def _nondet_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{n}' AS contract, {str(v).upper()} AS holds"
        for n, v in _NONDET_CONTRACTS
    )
    return f"SELECT contract, holds FROM ({rows}) ORDER BY contract"


@query("nondeterministic_funcs_contract", oracle=_nondet_oracle())
def nondeterministic_funcs_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The nondeterministic-function tool-belt — uuid(), rand(),
    monotonically_increasing_id(), spark_partition_id(),
    input_file_name() — produces values no cross-engine oracle can
    hash, so this query verifies the documented CONTRACTS instead
    and emits one pinned boolean per contract: ids distinct AND
    increasing within their generation order, partition ids within
    [0, numPartitions), rand() in [0, 1), the scan's
    input_file_name ending in orders.parquet, uuids distinct and
    RFC-4122-shaped. A broken contract flips a literal and fails the
    value-hash."""
    # input_file_name() is only defined in the scan's own stage — a
    # limit() above the scan would shuffle and blank it, so project
    # first, limit after
    probe = (
        Catalog(spark, sf_dir)
        .orders.select(
            F.monotonically_increasing_id().alias("mid"),
            F.spark_partition_id().alias("pid"),
            F.rand(seed=7).alias("r"),
            F.input_file_name().alias("fn"),
            F.expr("uuid()").alias("u"),
        )
        .limit(2000)
    )
    agg = probe.agg(
        (
            (F.count_distinct("mid") == F.count(F.lit(1)))
            & (F.max("mid") >= F.min("mid"))
        ).alias("mid_distinct_and_increasing"),
        (
            (F.min("pid") >= 0)
            & (F.max("pid") < spark.sparkContext.defaultParallelism + 64)
        ).alias("partition_ids_in_range"),
        ((F.min("r") >= 0.0) & (F.max("r") < 1.0)).alias(
            "rand_in_unit_interval"
        ),
        F.every(F.col("fn").contains("orders.parquet")).alias(
            "scanned_from_orders_parquet"
        ),
        (F.count_distinct("u") == F.count(F.lit(1))).alias(
            "uuids_all_distinct"
        ),
        F.every(
            F.col("u").rlike(
                "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab]"
                "[0-9a-f]{3}-[0-9a-f]{12}$"
            )
        ).alias("uuids_rfc4122_format"),
    ).collect()[0]
    return (
        spark.createDataFrame(
            [
                Row(contract=k, holds=bool(agg[k]))
                for k, _ in _NONDET_CONTRACTS
            ]
        )
        .orderBy("contract")
    )


@query(
    "variant_functions_wave2",
    oracle="""
    SELECT event_id,
           'OBJECT<k: BIGINT>' AS vschema,
           FALSE AS top_is_null,
           CAST(json_extract_string(props, '$.k') AS VARCHAR)
               AS first_val,
           'k' AS first_key,
           1 AS n_fields,
           TRUE AS bad_parse_is_null
    FROM events
    WHERE event_type = 'purchase'
      AND json_extract_string(props, '$.k') IS NOT NULL
      AND event_id < 2000
    ORDER BY event_id
    """,
)
def variant_functions_wave2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """VARIANT tool-belt wave 2 (Spark 4): parse_json into a VARIANT,
    schema_of_variant (pinned against the known payload shape),
    is_variant_null (JSON null vs SQL NULL distinction),
    variant_explode as a LATERAL table function over the object's
    fields, and try_parse_json's NULL-on-garbage contract. The
    exploded field values are cast to string before output — raw
    VARIANT cells can't survive the gate's pandas canonicalizer."""
    ev = Catalog(spark, sf_dir).events
    ev.where(
        (F.col("event_type") == "purchase")
        & (F.col("event_id") < 2000)
        & F.get_json_object("props", "$.k").isNotNull()
    ).createOrReplaceTempView("variant_w2_src")
    return spark.sql(
        """
        SELECT event_id,
               schema_of_variant(parse_json(props)) AS vschema,
               is_variant_null(parse_json(props)) AS top_is_null,
               CAST(ve.value AS STRING) AS first_val,
               ve.key AS first_key,
               CAST(count(*) OVER (PARTITION BY event_id) AS INT)
                   AS n_fields,
               try_parse_json('{not json') IS NULL
                   AS bad_parse_is_null
        FROM variant_w2_src,
             LATERAL variant_explode(parse_json(props)) ve
        WHERE ve.pos = 0
        ORDER BY event_id
        """
    )
