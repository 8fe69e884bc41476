"""SURVEY.md §2.2 round-5 additions — remaining ANSI/HiveQL syntax
surfaces: the LIKE predicate family (ILIKE / RLIKE / LIKE ALL / LIKE
ANY), the SQL PIVOT→UNPIVOT clause round trip, the named WINDOW
clause, and the remaining date built-ins (months_between's fractional
31-day rule, next_day, ISO week, quarter, dayofweek).

All pure-SQL single-scan shapes; every oracle replays the exact
semantics (DuckDB spells RLIKE as regexp_matches, LIKE ALL as a
conjunction, dayofweek 0-based → +1, months_between via the
documented day-diff/31 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "like_family",
    oracle="""
    SELECT CAST(sum(CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_like,
           CAST(sum(CASE WHEN p_name ILIKE '%GOLD%' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ilike,
           CAST(sum(CASE WHEN regexp_matches(p_name, 'spring|autumn')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_rlike,
           CAST(sum(CASE WHEN p_name LIKE '%o%' AND p_name LIKE '%e%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
           CAST(sum(CASE WHEN p_name LIKE '%ros%' OR p_name LIKE '%bl%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any
    FROM part
    """,
)
def like_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full LIKE predicate family in one scan: plain LIKE,
    case-insensitive ILIKE, regex RLIKE, and the multi-pattern
    LIKE ALL / LIKE ANY quantifiers (which Hive users otherwise
    hand-expand into AND/OR chains). All compile to JVM predicates
    inside one whole-stage-codegen pass — five predicates cost one
    scan, the reason quantified LIKE exists."""
    Catalog(spark, sf_dir).part.createOrReplaceTempView(
        "like_part_src"
    )
    return spark.sql(
        """
        SELECT CAST(sum(CASE WHEN p_name LIKE '%gold%'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like,
               CAST(sum(CASE WHEN p_name ILIKE '%GOLD%'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_ilike,
               CAST(sum(CASE WHEN p_name RLIKE 'spring|autumn'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_rlike,
               CAST(sum(CASE WHEN p_name LIKE ALL ('%o%', '%e%')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like_all,
               CAST(sum(CASE WHEN p_name LIKE ANY ('%ros%', '%bl%')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_like_any
        FROM like_part_src
        """
    )


@query(
    "sql_pivot_unpivot",
    oracle="""
    SELECT o_orderpriority, o_orderstatus AS status,
           count(*) AS n
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    ORDER BY o_orderpriority, status
    """,
)
def sql_pivot_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIVOT → UNPIVOT round trip (the clause syntax, distinct
    from the DataFrame pivot API `pivot_orders` covers): order counts
    pivot to one column per status, then unpivot back to rows — the
    round trip must reproduce the plain GROUP BY exactly (UNPIVOT's
    NULL-exclusion drops precisely the combos that never existed).
    One scan for the pivot; unpivot is a map-side expand."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "pivot_orders_src"
    )
    return spark.sql(
        """
        WITH p AS (
          SELECT * FROM (
            SELECT o_orderpriority, o_orderstatus
            FROM pivot_orders_src)
          PIVOT (count(*) FOR o_orderstatus IN
                 ('O' AS st_O, 'F' AS st_F, 'P' AS st_P))
        )
        SELECT o_orderpriority,
               CASE status WHEN 'st_O' THEN 'O' WHEN 'st_F' THEN 'F'
                    ELSE 'P' END AS status,
               n
        FROM p UNPIVOT (n FOR status IN (st_O, st_F, st_P))
        ORDER BY o_orderpriority, status
        """
    )


@query(
    "named_window_clause",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           round(sum(o_totalprice) OVER w, 2) AS run_total,
           round(max(o_totalprice) OVER w, 2) AS run_max
    FROM orders
    WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL WINDOW clause: one named spec shared by several window
    functions — beyond readability, a single named window guarantees
    Catalyst plans ONE sort/partition pass for all of them (inline
    specs rely on spec-equality detection). Identical clause syntax
    both engines."""
    Catalog(spark, sf_dir).orders.createOrReplaceTempView(
        "winclause_orders_src"
    )
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(row_number() OVER w AS BIGINT) AS rn,
               round(sum(o_totalprice) OVER w, 2) AS run_total,
               round(max(o_totalprice) OVER w, 2) AS run_max
        FROM winclause_orders_src
        WHERE o_custkey < 200
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        """
    )


@query(
    "date_builtins_wave3",
    oracle="""
    SELECT o_orderkey,
           round((year(o_orderdate) - 2023) * 12
                 + (month(o_orderdate) - 1)
                 + CASE WHEN day(o_orderdate) = 15 THEN 0.0
                        ELSE (day(o_orderdate) - 15) / 31.0 END,
                 4) AS mb_anchor,
           CAST(o_orderdate + INTERVAL (
                 CASE WHEN (8 - isodow(o_orderdate)) % 7 = 0 THEN 7
                      ELSE (8 - isodow(o_orderdate)) % 7 END) DAY
               AS DATE) AS next_monday,
           CAST(week(o_orderdate) AS INTEGER) AS iso_week,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
    FROM orders WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
)
def date_builtins_wave3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining date built-ins: months_between against a fixed
    anchor (fractional (day₁−day₂)/31 rule replayed arithmetically in
    the oracle — equal day-of-month yields exact integers), next_day
    to the following Monday (strictly after, hence the %7→7 wrap in
    the oracle's isodow arithmetic), ISO week number, quarter, and
    dayofweek (Spark 1=Sunday vs DuckDB 0=Sunday, hence +1). All
    map-only."""
    o = Catalog(spark, sf_dir).orders.where(F.col("o_orderkey") < 2000)
    return o.select(
        "o_orderkey",
        F.round(
            F.months_between(
                F.col("o_orderdate"), F.lit("2023-01-15").cast("date")
            ),
            4,
        ).alias("mb_anchor"),
        F.next_day("o_orderdate", "MO").alias("next_monday"),
        F.weekofyear("o_orderdate").alias("iso_week"),
        F.quarter("o_orderdate").alias("qtr"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")


@query(
    "array_funcs_wave3",
    oracle="""
    WITH ws AS (
      SELECT p_partkey, string_split(p_name, ' ') AS w FROM part
      WHERE p_partkey < 2000)
    SELECT p_partkey,
           CAST(len(flatten([w, ['tail']])) AS INTEGER) AS flat_n,
           CAST(len(list_filter(
                 list_transform(w, x -> CASE WHEN len(x) > 4
                                        THEN x END),
                 x -> x IS NOT NULL)) AS INTEGER) AS compact_n,
           list_prepend('head', w)[1] AS prepended_first,
           list_append(w, 'tail')[-1] AS appended_last,
           CAST(coalesce(list_position(w, 'spring'), 0) AS BIGINT)
               AS pos_spring,
           CAST(len(list_filter(w, x -> x <> w[1])) AS INTEGER)
               AS removed_n,
           len(list_intersect(w, ['spring', 'autumn'])) > 0
               AS has_season
    FROM ws ORDER BY p_partkey
    """,
)
def array_funcs_wave3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining array built-ins: flatten, array_compact (null
    removal), array_prepend/append, array_position (0 when absent —
    DuckDB's NULL coalesced to match), array_remove (all
    occurrences), arrays_overlap. All map-only element expressions —
    one scan, no shuffle but the presentation sort."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 2000)
    w = F.split("p_name", " ")
    nullified = F.transform(
        w, lambda x: F.when(F.length(x) > 4, x)
    )
    return p.select(
        "p_partkey",
        F.size(F.flatten(F.array(w, F.array(F.lit("tail"))))).alias(
            "flat_n"
        ),
        F.size(F.array_compact(nullified)).alias("compact_n"),
        F.element_at(F.array_prepend(w, "head"), 1).alias(
            "prepended_first"
        ),
        F.element_at(F.array_append(w, "tail"), -1).alias(
            "appended_last"
        ),
        F.array_position(w, "spring").alias("pos_spring"),
        F.size(F.array_remove(w, F.element_at(w, 1))).alias(
            "removed_n"
        ),
        F.arrays_overlap(
            w, F.array(F.lit("spring"), F.lit("autumn"))
        ).alias("has_season"),
    ).orderBy("p_partkey")


@query(
    "string_funcs_wave4",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
               w -> upper(w[1:1]) || lower(w[2:])), ' ') AS title_name,
           substr(p_name, 1, 2) || 'XX' || substr(p_name, 5)
               AS overlaid,
           left(p_name, 4) AS l4,
           right(p_name, 4) AS r4,
           printf('%s|%03d', p_name, p_size) AS tagged,
           prefix(p_name, 'b') AS starts_b,
           suffix(p_name, 'e') AS ends_e,
           contains(p_name, 'ol') AS has_ol,
           CAST(len(regexp_extract_all(p_name, '[aeiou]+'))
                AS INTEGER) AS vowel_runs
    FROM part WHERE p_partkey < 2000 ORDER BY p_partkey
    """,
)
def string_funcs_wave4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remaining string built-ins: initcap (oracle rebuilds it
    word-by-word — DuckDB has no initcap), overlay (PLACING/FROM
    replacement), left/right, format_string printf templates,
    startswith/endswith/contains predicates, and regexp_extract_all
    run counts. Map-only single scan."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 2000)
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("title_name"),
        F.overlay("p_name", F.lit("XX"), F.lit(3)).alias("overlaid"),
        F.expr("left(p_name, 4)").alias("l4"),
        F.expr("right(p_name, 4)").alias("r4"),
        F.format_string("%s|%03d", "p_name", "p_size").alias("tagged"),
        F.startswith("p_name", F.lit("b")).alias("starts_b"),
        F.endswith("p_name", F.lit("e")).alias("ends_e"),
        F.contains("p_name", F.lit("ol")).alias("has_ol"),
        F.size(
            F.expr("regexp_extract_all(p_name, '[aeiou]+', 0)")
        ).alias("vowel_runs"),
    ).orderBy("p_partkey")


@query(
    "timezone_conversions",
    oracle="""
    SELECT event_id,
           CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                AT TIME ZONE 'America/New_York' AS TIMESTAMP) AS ny_ts,
           CAST(hour(CAST(CAST(ts AS TIMESTAMP) AT TIME ZONE 'UTC'
                AT TIME ZONE 'Asia/Tokyo' AS TIMESTAMP)) AS INTEGER)
               AS tokyo_hour,
           TRUE AS roundtrip_ok
    FROM events WHERE event_id < 2000 ORDER BY event_id
    """,
)
def timezone_conversions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_utc_timestamp / to_utc_timestamp — the wall-clock
    reporting conversions every global warehouse runs at the
    presentation edge (storage stays UTC; conversion is per-query).
    The NY and Tokyo conversions are value-checked against DuckDB's
    ICU AT TIME ZONE chain, and the roundtrip_ok flag carries the
    computed to_utc(from_utc(ts)) == ts invariant (not a literal).
    January data pins the US offset to EST; a DST-boundary dataset
    would exercise the gap/overlap rules the same code path
    handles."""
    ev = Catalog(spark, sf_dir).events.where(F.col("event_id") < 2000)
    ny = F.from_utc_timestamp("ts", "America/New_York")
    back = F.to_utc_timestamp(ny, "America/New_York")
    return ev.select(
        "event_id",
        ny.alias("ny_ts"),
        F.hour(F.from_utc_timestamp("ts", "Asia/Tokyo"))
        .cast("int")
        .alias("tokyo_hour"),
        (back == F.col("ts")).alias("roundtrip_ok"),
    ).orderBy("event_id")


@query(
    "array_exists_forall",
    oracle="""
    WITH ws AS (
      SELECT p_partkey, string_split(p_name, ' ') AS w FROM part
      WHERE p_partkey < 2000)
    SELECT p_partkey,
           len(list_filter(w, x -> len(x) > 6)) > 0 AS any_long,
           len(list_filter(w, x -> NOT regexp_matches(x, '^[a-z]+$')))
               = 0 AS all_alpha,
           CAST(len(list_filter(w, (x, i) -> i % 2 = 1)) AS INTEGER)
               AS n_even_pos,
           CAST(list_sum(list_transform(w, x -> len(x))) * 10
                AS BIGINT) AS len_sum_x10
    FROM ws ORDER BY p_partkey
    """,
)
def array_exists_forall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The higher-order predicate quartet: exists / forall /
    index-aware filter / aggregate-with-finish — all JVM lambda
    expressions inside one codegen stage (the reason these beat a
    Python UDF by orders of magnitude). Index bases differ across
    engines (Spark 0-based, DuckDB 1-based) — the oracle mirrors
    even-position selection accordingly; the finish lambda is
    replayed as arithmetic."""
    p = Catalog(spark, sf_dir).part.where(F.col("p_partkey") < 2000)
    w = F.split("p_name", " ")
    return p.select(
        "p_partkey",
        F.exists(w, lambda x: F.length(x) > 6).alias("any_long"),
        F.forall(w, lambda x: x.rlike("^[a-z]+$")).alias("all_alpha"),
        F.size(
            F.filter(w, lambda x, i: i % 2 == 0)
        ).cast("int").alias("n_even_pos"),
        F.aggregate(
            w,
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.length(x),
            lambda acc: acc * 10,
        ).cast("long").alias("len_sum_x10"),
    ).orderBy("p_partkey")
