"""W3-W5 window breadth, grouping sets, pivot (classic OLAP surface) — split from the single-module registry_ext (round 6).

Registration order is load-bearing (the __spark_entry__ witness rotation
samples in registration order): registry_ext/__init__.py imports the
block modules in the original file's order and entries within each module
keep their original sequence — append, don't reorder.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from ..catalog import load_table  # noqa: F401
from ..operators import dedup, multimodal, sampling, similarity, text  # noqa: F401
from ..registry import query  # noqa: F401
from ._shared import (  # noqa: F401
    _LANG_CASE,
    _LANG_GREATEST,
    _LANG_SCORE_SQL,
    _RT_DIRS,
    _SCD2_FULL_RECOMPUTE_ORACLE,
    _STOP_LIST,
    _marker_list,
    _rt_tmpdir,
    _t,
    _with_synthetic_near_dups,
)

# ===========================================================================
# W3-W5 window breadth, grouping sets, pivot (classic OLAP surface)
# ===========================================================================


@query(
    "w3_running_user_metrics",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
            PARTITION BY user_id ORDER BY epoch(ts)
            RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS DOUBLE) AS value_7d,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq,
       CAST(NTILE(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS INT) AS value_quartile,
       round(PERCENT_RANK() OVER (PARTITION BY user_id ORDER BY value, event_id), 6) AS value_pctrank
FROM events
WHERE user_id < 50
ORDER BY user_id, seq
""",
)
def w3_running_user_metrics(spark, sf_dir):
    """W3-W5 window breadth: a 7-day RANGE-frame running sum (event-time
    sliding aggregate), NTILE quartiles and PERCENT_RANK — all FOUR window
    functions share ONE user_id partitioning (different orderings re-sort
    within partitions but never re-shuffle).  The range frame orders by
    epoch seconds so Spark's rangeBetween (long offsets) and DuckDB's
    RANGE INTERVAL semantics meet on the identical integer frame."""
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    epoch = F.unix_timestamp("ts")
    w_range = (
        Window.partitionBy("user_id").orderBy(epoch).rangeBetween(-604800, 0)
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_val = Window.partitionBy("user_id").orderBy("value", "event_id")
    return (
        e.select(
            "event_id",
            "user_id",
            F.sum(F.col("value").cast("decimal(38,6)")).over(w_range)
            .cast("double")
            .alias("value_7d"),
            F.row_number().over(w_seq).cast("int").alias("seq"),
            F.ntile(4).over(w_val).cast("int").alias("value_quartile"),
            F.round(F.percent_rank().over(w_val), 6).alias("value_pctrank"),
        )
        .orderBy("user_id", "seq")
    )


@query(
    "a5_rollup_revenue",
    oracle="""
SELECT COALESCE(r.r_name, 'ALL') AS region_name,
       COALESCE(n.n_name, 'ALL') AS nation_name,
       CAST(GROUPING(r.r_name) * 2 + GROUPING(n.n_name) AS INT) AS gid,
       CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r.r_name, n.n_name)
ORDER BY gid, region_name, nation_name
""",
)
def a5_rollup_revenue(spark, sf_dir):
    """A5 grouping sets: revenue at nation, region and grand-total levels
    in ONE pass via ROLLUP — the multi-granularity aggregation an OLAP
    cube needs without three separate scans.  GROUPING() bits pin the
    level id identically on both engines; NULL group keys render as
    'ALL'.  Scale: rollup is a single expanded aggregation — one shuffle,
    partial aggregation still applies."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
    )
    gid = (F.grouping("r_name") * 2 + F.grouping("n_name")).cast("int")
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
            )
            .cast("double")
            .alias("revenue"),
            gid.alias("gid"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region_name"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation_name"),
            "gid",
            "revenue",
        )
        .orderBy("gid", "region_name", "nation_name")
    )


@query(
    "a6_priority_pivot",
    oracle="""
SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
       CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS high,
       CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS medium,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN
                ('1-URGENT','2-HIGH','3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT) AS other
FROM orders
GROUP BY o_year
ORDER BY o_year
""",
)
def a6_priority_pivot(spark, sf_dir):
    """A6 pivot: order counts per year spread across priority columns —
    ``groupBy().pivot(values=[...])`` with an EXPLICIT value list (never
    the two-pass distinct-discovery form at scale) plus an 'other'
    bucket.  A pivot with a known value list compiles to exactly the
    CASE-sum aggregation the oracle states: one shuffle, map-side
    partials."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "urgent")
        .when(F.col("o_orderpriority") == "2-HIGH", "high")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("other")
    )
    return (
        o.select(F.year("o_orderdate").cast("int").alias("o_year"), bucket.alias("b"))
        .groupBy("o_year")
        .pivot("b", ["urgent", "high", "medium", "other"])
        .count()
        .fillna(0)
        .orderBy("o_year")
    )


@query(
    "u2_setops_repeat_customers",
    oracle="""
WITH c97 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
),
c98 AS (
    SELECT DISTINCT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
)
SELECT 'both' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c97 INTERSECT SELECT * FROM c98)
UNION ALL
SELECT 'only_1997' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c97 EXCEPT SELECT * FROM c98)
UNION ALL
SELECT 'only_1998' AS cohort, COUNT(*) AS n FROM (SELECT * FROM c98 EXCEPT SELECT * FROM c97)
ORDER BY cohort
""",
)
def u2_setops_repeat_customers(spark, sf_dir):
    """U2 set-operation breadth: INTERSECT / EXCEPT / UNION ALL over
    year-cohort customer keys — retained vs churned vs new-customer
    counts.  Set ops on DISTINCT key sets plan as semi/anti joins on one
    key column (slim shuffles); the year filters push to the orders
    scan."""
    o = load_table(spark, sf_dir, "orders")
    def cohort(y):
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01 00:00:00").cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )
    c97, c98 = cohort(1997), cohort(1998)
    both = c97.intersect(c98).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("cohort"), "n"
    )
    only97 = c97.exceptAll(c98).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1997").alias("cohort"), "n"
    )
    only98 = c98.exceptAll(c97).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("only_1998").alias("cohort"), "n"
    )
    return both.unionByName(only97).unionByName(only98).orderBy("cohort")


@query(
    "f8_scalar_breadth",
    oracle="""
SELECT o_orderkey,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS order_month,
       CAST(datediff('day', CAST('1995-01-01' AS DATE), CAST(o_orderdate AS DATE)) AS INT) AS days_since_epoch_start,
       CAST(EXTRACT(QUARTER FROM o_orderdate) AS INT) AS order_quarter,
       CAST(EXTRACT(DOW FROM o_orderdate) AS INT) AS order_dow,
       upper(substr(o_orderpriority, 3)) AS priority_word,
       CAST(length(o_orderstatus) AS INT) AS status_len,
       concat(o_orderstatus, '/', o_orderpriority) AS status_priority,
       replace(o_orderpriority, '-', '_') AS priority_snake,
       CAST(round(o_totalprice, -2) AS DOUBLE) AS price_rounded,
       CAST(CASE WHEN o_totalprice >= 0 THEN floor(sqrt(o_totalprice)) ELSE NULL END AS BIGINT) AS price_sqrt_floor
FROM orders
WHERE o_orderkey < 2000
ORDER BY o_orderkey
""",
)
def f8_scalar_breadth(spark, sf_dir):
    """F8 scalar-function breadth (§2.8 completeness): date_trunc,
    day-diff, quarter/day-of-week extraction, substring/upper/concat/
    replace string derivations, round-to-hundreds and integer sqrt — every
    expression a built-in (JVM codegen, no UDF), each aliased identically
    to the oracle.  DOW convention pinned: both engines number Sunday=0
    via dayofweek()-1."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    return (
        o.select(
            "o_orderkey",
            F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias(
                "order_month"
            ),
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("int")
            .alias("days_since_epoch_start"),
            F.quarter("o_orderdate").cast("int").alias("order_quarter"),
            (F.dayofweek("o_orderdate") - 1).cast("int").alias("order_dow"),
            F.upper(F.substring("o_orderpriority", 3, 100)).alias("priority_word"),
            F.length("o_orderstatus").cast("int").alias("status_len"),
            F.concat_ws("/", "o_orderstatus", "o_orderpriority").alias("status_priority"),
            F.regexp_replace("o_orderpriority", "-", "_").alias("priority_snake"),
            F.round(F.col("o_totalprice"), -2).cast("double").alias("price_rounded"),
            F.when(F.col("o_totalprice") >= 0, F.floor(F.sqrt("o_totalprice")))
            .cast("bigint")
            .alias("price_sqrt_floor"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "f10_array_funcs",
    oracle="""
WITH g AS (
    SELECT l_orderkey, list_sort(list(CAST(l_quantity AS INT))) AS qty_arr
    FROM lineitem WHERE l_orderkey < 200 GROUP BY l_orderkey
)
SELECT l_orderkey,
       CAST(len(qty_arr) AS INT) AS n_items,
       array_to_string(qty_arr, ',') AS qty_csv,
       array_to_string(qty_arr[1:3], ',') AS top3_csv,
       COALESCE(array_to_string(list_filter(qty_arr, x -> x % 2 = 0), ','), '') AS even_csv,
       CAST(list_sum(list_transform(qty_arr, x -> x * 2)) AS BIGINT) AS doubled_sum,
       CAST(len(list_distinct(qty_arr)) AS INT) AS n_distinct,
       CAST(list_max(qty_arr) AS INT) AS max_qty,
       CAST(list_contains(qty_arr, 10) AS INT) AS has_ten
FROM g
ORDER BY l_orderkey
""",
)
def f10_array_funcs(spark, sf_dir):
    """F10 array / higher-order function breadth: collect_list +
    array_sort aggregation, then slice, lambda filter, transform-and-fold
    (``aggregate``), array_distinct, array_max, array_contains — the
    complex-type layer a curation pipeline leans on for shingles, token
    lists, and embedding manipulation.  Every lambda runs JVM-side
    (Catalyst higher-order functions, no Python); arrays leave the query
    as CSV strings so the driver canon stays scalar
    (oracle: DuckDB list_* equivalents)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    g = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_list(F.col("l_quantity").cast("int"))).alias("qty_arr")
    )
    return g.select(
        "l_orderkey",
        F.size("qty_arr").cast("int").alias("n_items"),
        F.array_join(F.col("qty_arr").cast("array<string>"), ",").alias("qty_csv"),
        F.array_join(F.slice("qty_arr", 1, 3).cast("array<string>"), ",").alias(
            "top3_csv"
        ),
        F.array_join(
            F.filter("qty_arr", lambda x: x % 2 == 0).cast("array<string>"), ","
        ).alias("even_csv"),
        F.aggregate(
            "qty_arr", F.lit(0).cast("bigint"), lambda acc, x: acc + x * 2
        ).alias("doubled_sum"),
        F.size(F.array_distinct("qty_arr")).cast("int").alias("n_distinct"),
        F.array_max("qty_arr").cast("int").alias("max_qty"),
        F.array_contains("qty_arr", F.lit(10)).cast("int").alias("has_ten"),
    ).orderBy("l_orderkey")


