"""SURVEY.md §2.2 continued — remaining HiveQL surface families:
TABLESAMPLE-bucket sampling, map type construction/access (str_to_map,
create_map), posexplode (UDTF), typed JSON (from_json), parse_url,
cryptographic hashes, bitwise ops, extended window functions
(percent_rank/cume_dist/nth_value/first/last), FILTER-style aggregates
(count_if/bool_and/bool_or).

All JVM-side built-ins — no Python UDFs; every query projects scalar
(or sorted-array) outputs so the DuckDB oracle hash-compares cleanly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hdsp_hive_release_src_spark.catalog import Catalog
from hdsp_hive_release_src_spark.registry import query


@query(
    "table_sample_bucket",
    oracle="""
    SELECT count(*) AS n_sampled,
           round(sum(o_totalprice), 2) AS sampled_total,
           count(DISTINCT o_custkey) AS n_custs
    FROM orders WHERE o_orderkey % 10 = 3
    """,
)
def table_sample_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive TABLESAMPLE(BUCKET 4 OUT OF 10 ON o_orderkey) — the
    deterministic hash/mod bucket sample (rand()-free so reruns,
    retried tasks, and the oracle all agree)."""
    o = Catalog(spark, sf_dir).orders
    return o.where(F.pmod("o_orderkey", F.lit(10)) == 3).agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("o_totalprice"), 2).alias("sampled_total"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@query(
    "table_sample_percent_rows",
    oracle="""
    SELECT CAST(200 AS BIGINT) AS n_rows_sample,
           TRUE AS pct_within_bounds,
           CAST(count(*) AS BIGINT) AS mod_sample_rows,
           CAST(sum(o_orderkey) AS BIGINT) AS mod_sample_keysum
    FROM orders WHERE o_orderkey % 20 = 0
    """,
)
def table_sample_percent_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TABLESAMPLE forms analysts actually type: ``(n ROWS)`` and
    ``(p PERCENT)`` — alongside the bucket form (table_sample_bucket).

    ROWS is an exact global limit (count asserted exactly). PERCENT is
    Bernoulli row sampling: REPEATABLE(seed) pins the sample within a
    run, but the per-partition seed offsets make the exact membership
    layout-dependent, so the cross-engine check is the statistical
    contract — the sampled fraction must sit within ±0.08 of 25%
    (≈7σ at smoke scale; a correctness bound, not a flaky one). The
    deterministic value-level twin both engines CAN hash-compare is
    the mod-sample (the established rand()-free pattern here), emitted
    as exact row count + key checksum. At 100 TB PERCENT sampling is
    the only one of the three that stays a map-only scan with no
    global coordination; n ROWS funnels through a single-stage limit
    and is the form to avoid on big tables."""
    o = Catalog(spark, sf_dir).orders
    o.createOrReplaceTempView("ts_orders_src")
    rows_n = spark.sql(
        "SELECT * FROM ts_orders_src TABLESAMPLE (200 ROWS)"
    ).agg(F.count(F.lit(1)).cast("long").alias("n_rows_sample"))
    pct_n = spark.sql(
        "SELECT * FROM ts_orders_src TABLESAMPLE (25 PERCENT) REPEATABLE (7)"
    ).agg(F.count(F.lit(1)).alias("pct_n"))
    # r13 subtree fix: the total count and the mod-sample twin are
    # plain aggregates over the SAME unsampled table — one conditional
    # agg pass instead of two scans (the two TABLESAMPLE scans keep
    # their own passes by definition: the sampling happens at the
    # scan). 4 scans -> 3.
    is_mod = F.pmod("o_orderkey", F.lit(20)) == 0
    tot_mod = o.agg(
        F.count(F.lit(1)).alias("total_n"),
        F.count(F.when(is_mod, 1)).cast("long").alias(
            "mod_sample_rows"
        ),
        F.sum(F.when(is_mod, F.col("o_orderkey")))
        .cast("long")
        .alias("mod_sample_keysum"),
    ).localCheckpoint()
    pct_ok = (
        pct_n.join(F.broadcast(tot_mod.select("total_n")))
        .select(
            (
                F.abs(F.col("pct_n") / F.col("total_n") - 0.25) < 0.08
            ).alias("pct_within_bounds")
        )
    )
    mod = tot_mod.select("mod_sample_rows", "mod_sample_keysum")
    return rows_n.join(F.broadcast(pct_ok)).join(F.broadcast(mod))


@query(
    "map_funcs",
    oracle="""
    SELECT p_partkey,
           p_brand AS brand_val,
           p_size AS size_val,
           CAST(2 AS INTEGER) AS n_keys,
           'brand,size' AS keys,
           p_retailprice AS price_val
    FROM part ORDER BY p_partkey LIMIT 200
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type family: str_to_map / create_map / map_keys /
    element_at — round-trips row values through a MAP column and back
    to scalars (the oracle checks the values, proving lossless
    construction + access)."""
    p = Catalog(spark, sf_dir).part
    kv = F.str_to_map(
        F.concat(
            F.lit("brand:"), F.col("p_brand"),
            F.lit(",size:"), F.col("p_size").cast("string"),
        ),
        F.lit(","),
        F.lit(":"),
    )
    m2 = F.create_map(F.lit("price"), F.col("p_retailprice"))
    return (
        p.select(
            "p_partkey",
            F.element_at(kv, "brand").alias("brand_val"),
            F.element_at(kv, "size").cast("int").alias("size_val"),
            F.size(kv).alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys(kv))).alias("keys"),
            F.element_at(m2, "price").alias("price_val"),
        )
        .orderBy("p_partkey")
        .limit(200)
    )


@query(
    "posexplode_tokens",
    oracle="""
    SELECT doc_id,
           unnest(list_transform(string_split(text, ' '),
                  (x, i) -> {'pos': i - 1, 'token': x}),
                  recursive := true)
    FROM documents WHERE doc_id < 20
    """,
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode UDTF (LATERAL VIEW posexplode in HiveQL): token +
    0-based position per document."""
    d = Catalog(spark, sf_dir).documents
    return d.where(F.col("doc_id") < 20).select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "token"),
    )


@query(
    "typed_json",
    oracle="""
    SELECT event_type,
           count(*) FILTER (WHERE CAST(json_extract_string(props, '$.k')
                AS INTEGER) >= 50) AS n_high,
           round(avg(CAST(json_extract_string(props, '$.k') AS INTEGER)), 4)
               AS avg_k
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def typed_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read typed JSON: from_json(props, 'k INT') → struct
    field access (vs. the stringly get_json_object path in
    json_extract) → conditional aggregation."""
    ev = Catalog(spark, sf_dir).events
    k = F.from_json("props", "k INT").getField("k")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count_if(k >= 50).alias("n_high"),
            F.round(F.avg(k), 4).alias("avg_k"),
        )
        .orderBy("event_type")
    )


@query(
    "url_parse",
    oracle="""
    SELECT doc_id,
           'ex.com' AS host,
           '/' || source || '/p' AS path,
           'q=' || lang || '&id=' || doc_id AS query,
           CAST(doc_id AS VARCHAR) AS id_param
    FROM documents WHERE doc_id < 200 ORDER BY doc_id
    """,
)
def url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive parse_url family: HOST / PATH / QUERY / QUERY:key
    extraction from a URL column."""
    d = Catalog(spark, sf_dir).documents
    url = F.concat(
        F.lit("https://ex.com/"), F.col("source"),
        F.lit("/p?q="), F.col("lang"),
        F.lit("&id="), F.col("doc_id").cast("string"),
    )
    return (
        d.where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.parse_url(url, F.lit("HOST")).alias("host"),
            F.parse_url(url, F.lit("PATH")).alias("path"),
            F.parse_url(url, F.lit("QUERY")).alias("query"),
            F.parse_url(url, F.lit("QUERY"), F.lit("id")).alias("id_param"),
        )
        .orderBy("doc_id")
    )


@query(
    "hash_funcs",
    oracle="""
    SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
    FROM documents WHERE doc_id < 100 ORDER BY doc_id
    """,
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash family (md5 / sha2-256) — hex parity with
    the oracle proves byte-identical canonicalization."""
    d = Catalog(spark, sf_dir).documents
    return (
        d.where(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
        )
        .orderBy("doc_id")
    )


@query(
    "bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS and255,
           o_orderkey | 4096 AS or4096,
           xor(o_orderkey, 255) AS xor255,
           (o_orderkey & 15) << 2 AS shl2,
           o_orderkey >> 4 AS shr4,
           CAST(bit_count(o_orderkey) AS INTEGER) AS nbits
    FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey
    """,
)
def bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise operator family: AND/OR/XOR/shifts/popcount."""
    o = Catalog(spark, sf_dir).orders
    k = F.col("o_orderkey")
    return (
        o.where(k < 500)
        .select(
            "o_orderkey",
            k.bitwiseAND(F.lit(255)).alias("and255"),
            k.bitwiseOR(F.lit(4096)).alias("or4096"),
            k.bitwiseXOR(F.lit(255)).alias("xor255"),
            F.shiftleft(k.bitwiseAND(F.lit(15)), 2).cast("long").alias("shl2"),
            F.shiftright(k, 4).cast("long").alias("shr4"),
            F.bit_count(k).alias("nbits"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "window_extended",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd,
           first_value(o_orderkey) OVER wf AS first_key,
           last_value(o_orderkey) OVER wf AS last_key,
           nth_value(o_orderkey, 2) OVER wf AS second_key
    FROM orders WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
           wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended window-function family: percent_rank / cume_dist /
    first_value / last_value / nth_value, with an explicit full-frame
    spec (default frames differ across engines — never rely on them)."""
    o = Catalog(spark, sf_dir).orders
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        o.where(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.first("o_orderkey").over(wf).alias("first_key"),
            F.last("o_orderkey").over(wf).alias("last_key"),
            F.nth_value("o_orderkey", 2).over(wf).alias("second_key"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "set_ops_all",
    oracle="""
    WITH asia AS (
      SELECT c_nationkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'),
    euro AS (
      SELECT c_nationkey AS k FROM customer WHERE c_acctbal > 5000)
    SELECT 'intersect_all' AS op, k FROM
      (SELECT k FROM asia INTERSECT ALL SELECT k FROM euro)
    UNION ALL
    SELECT 'except_all' AS op, k FROM
      (SELECT k FROM asia EXCEPT ALL SELECT k FROM euro)
    ORDER BY op, k
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): duplicates
    carry multiplicity — min(m1, m2) and m1 - m2 respectively — which
    the DISTINCT variants in `set_ops` erase. Spark compiles both to a
    single count-compare aggregation, no join explosion."""
    c = Catalog(spark, sf_dir).customer
    a = c.where(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_nationkey").alias("k")
    )
    b = c.where(F.col("c_acctbal") > 5000).select(
        F.col("c_nationkey").alias("k")
    )
    return (
        a.intersectAll(b)
        .select(F.lit("intersect_all").alias("op"), "k")
        .unionByName(
            a.exceptAll(b).select(F.lit("except_all").alias("op"), "k")
        )
        .orderBy("op", "k")
    )


@query(
    "fuzzy_match",
    oracle="""
    SELECT p_partkey,
           levenshtein(split_part(p_name, ' ', 1),
                       split_part(p_name, ' ', 2)) AS lev_within,
           levenshtein(p_brand, 'Brand#1') AS lev_brand,
           coalesce(array_to_string(regexp_extract_all(p_name, '[a-z]{4,}'),
                                    chr(31)), '') AS long_words
    FROM part WHERE p_partkey < 300 ORDER BY p_partkey
    """,
)
def fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy-matching family: levenshtein edit distance (entity-
    resolution primitive) + regexp_extract_all array extraction. At
    scale, edit distance belongs AFTER a blocking join (never pairwise
    across the corpus) — here it scores within-row name tokens. The
    extracted array is unit-separator-joined (order is positional, so
    no sort needed) — raw list cells crash the driver's pandas
    canonicalization (unhashable type)."""
    p = Catalog(spark, sf_dir).part
    w1 = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    w2 = F.split_part(F.col("p_name"), F.lit(" "), F.lit(2))
    return (
        p.where(F.col("p_partkey") < 300)
        .select(
            "p_partkey",
            F.levenshtein(w1, w2).alias("lev_within"),
            F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev_brand"),
            F.concat_ws(
                "\x1f",
                F.regexp_extract_all("p_name", F.lit("[a-z]{4,}"), 0),
            ).alias("long_words"),
        )
        .orderBy("p_partkey")
    )


@query(
    "window_rank_variants",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(row_number() OVER (PARTITION BY o_custkey
               ORDER BY round(o_totalprice / 10000), o_orderkey
               ) AS BIGINT) AS rn
    FROM orders WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY round(o_totalprice / 10000))
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank vs row_number on a deliberately tie-heavy
    key (price bucketed to 10k): rank leaves gaps after ties,
    dense_rank doesn't, row_number needs the explicit tiebreak to stay
    deterministic — the classic three-way semantic distinction."""
    o = Catalog(spark, sf_dir).orders
    bucket = F.round(F.col("o_totalprice") / 10000)
    w = Window.partitionBy("o_custkey").orderBy(bucket)
    wd = Window.partitionBy("o_custkey").orderBy(bucket, "o_orderkey")
    return (
        o.where(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.row_number().over(wd).cast("long").alias("rn"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "filtered_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS n_bulk,
           bool_and(l_discount < 0.1) AS all_low_disc,
           bool_or(l_tax > 0.07) AS any_high_tax
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTER-clause aggregate family: count_if + bool_and/bool_or
    (Hive's conditional-aggregation idioms, single-pass mergeable)."""
    li = Catalog(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count_if(F.col("l_quantity") > 25).alias("n_bulk"),
            F.bool_and(F.col("l_discount") < 0.1).alias("all_low_disc"),
            F.bool_or(F.col("l_tax") > 0.07).alias("any_high_tax"),
        )
        .orderBy("l_returnflag")
    )
