"""Scale-technique operators: salted aggregation/join equivalence and
bucketed-table shuffle elimination."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from etl_for_ecol_fusion_database_spark.catalog import load_table
from etl_for_ecol_fusion_database_spark.operators import skew
from etl_for_ecol_fusion_database_spark.sources import writers


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_groupby_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_extendedprice").alias("max_price"),
    )
    salted = skew.salted_groupby(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "n": ("count", "l_quantity"),
            "min_ship": ("min", "l_shipdate"),
            "max_price": ("max", "l_extendedprice"),
        },
        n_salt=16,
    )
    cols = ["l_returnflag", "sum_qty", "n", "min_ship", "max_price"]
    # sums of doubles: compare with rounding (combine order differs)
    a = [(r[0], round(r[1], 6), r[2], r[3], round(r[4], 6)) for r in _rows(plain, cols)]
    b = [(r[0], round(r[1], 6), r[2], r[3], round(r[4], 6)) for r in _rows(salted, cols)]
    assert a == b


def test_salt_spreads_clustered_hot_key(spark):
    """The clustered-skew case: a hot key packed into ONE input partition
    (data pre-sorted by the key) must still receive many distinct salt
    values — a partition-id-derived salt would collapse to a single value
    here and degrade to the unsalted plan."""
    hot = spark.range(10_000).select(F.lit("hot").alias("k"), F.col("id").alias("v"))
    one_split = hot.coalesce(1)
    n_salts = (
        one_split.withColumn("_salt", skew._row_salt(16, one_split.columns))
        .select("_salt")
        .distinct()
        .count()
    )
    assert n_salts == 16
    # and the salted aggregate over that clustered input is still exact
    out = skew.salted_groupby(one_split, ["k"], {"s": ("sum", "v"), "n": ("count", "v")})
    row = out.collect()[0]
    assert (row.k, row.s, row.n) == ("hot", sum(range(10_000)), 10_000)


def test_salted_groupby_rejects_non_algebraic(spark, sf_dir):
    import pytest

    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError):
        skew.salted_groupby(li, ["l_returnflag"], {"avg_q": ("avg", "l_quantity")})


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_mktsegment")
    salted = skew.salted_join(orders, customer, "o_custkey", n_salt=8).select(
        "o_orderkey", "c_mktsegment"
    )
    assert _rows(plain, ["o_orderkey", "c_mktsegment"]) == _rows(
        salted, ["o_orderkey", "c_mktsegment"]
    )


def test_dynamic_partition_overwrite_is_incremental(spark, sf_dir, tmp_path):
    """Re-writing one partition must leave the others untouched (the
    idempotent day-reload pattern); a partition-key filter must prune the
    scan to that partition's files."""
    events = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    path = str(tmp_path / "events_by_day")
    writers.overwrite_partitions(events, path, partition_by=["day"])
    total = spark.read.parquet(path).count()
    one_day = events.agg(F.min("day").alias("d")).collect()[0].d
    # rewrite ONE day with a mutated subset (half the rows)
    subset = events.filter(F.col("day") == one_day).filter(F.col("event_id") % 2 == 0)
    n_subset = subset.count()
    writers.overwrite_partitions(subset, path, partition_by=["day"])
    after = spark.read.parquet(path)
    day_rows = after.filter(F.col("day") == one_day).count()
    assert day_rows == n_subset, "target partition not replaced"
    others_before = total - events.filter(F.col("day") == one_day).count()
    assert after.count() - day_rows == others_before, "other partitions were touched"
    # partition pruning: the day filter must appear as PartitionFilters
    q = after.filter(F.col("day") == one_day).select("event_id")
    q.count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan.split("PartitionFilters")[1][:80]


def test_bucketed_join_eliminates_shuffle(spark, sf_dir, tmp_path):
    # warehouse.dir is static conf — park the test DB at an explicit location
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bkt LOCATION '{tmp_path / 'wh'}'")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    spark.sql("DROP TABLE IF EXISTS bkt.b_orders")
    spark.sql("DROP TABLE IF EXISTS bkt.b_lineitem")
    writers.write_bucketed(orders, "bkt.b_orders", bucket_by="o_orderkey", n_buckets=8)
    writers.write_bucketed(
        lineitem, "bkt.b_lineitem", bucket_by="o_orderkey", n_buckets=8
    )
    a = spark.table("bkt.b_orders")
    b = spark.table("bkt.b_lineitem")
    # force a non-broadcast join so the shuffle question is real
    joined = a.hint("merge").join(b, "o_orderkey").groupBy("o_orderstatus").count()
    joined.count()
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # the JOIN reads both bucketed scans directly — no exchange below the
    # SortMergeJoin; the only shuffle is the later groupBy on a different key
    join_pos = plan.index("SortMergeJoin")
    assert "Exchange" not in plan[join_pos:], (
        f"bucketed join inputs were shuffled:\n{plan}"
    )
    assert plan.count("Bucketed: true") == 2
    exchanges = re.findall(r"Exchange hashpartitioning\(([a-z_]+)", plan)
    assert exchanges == ["o_orderstatus"], exchanges
    # and results match the unbucketed join
    plain = (
        orders.join(lineitem, "o_orderkey").groupBy("o_orderstatus").count()
    )
    assert _rows(joined, ["o_orderstatus", "count"]) == _rows(
        plain, ["o_orderstatus", "count"]
    )
    spark.sql("DROP TABLE IF EXISTS bkt.b_orders")
    spark.sql("DROP TABLE IF EXISTS bkt.b_lineitem")
    spark.sql("DROP DATABASE IF EXISTS bkt")

def test_domain_mixture_rates_and_mass(spark, sf_dir):
    """Mixture invariants: rates weighted toward small domains
    (alpha=0.5), total target mass == corpus size, and realized integer
    repeat mass within 1/1000-per-doc of the target."""
    from etl_for_ecol_fusion_database_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    mix = sampling.domain_mixture(docs, "lang", alpha=0.5).cache()
    per_dom = (
        mix.groupBy("domain")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.first("target_rate").alias("rate"),
            F.sum("n_repeats").alias("realized"),
        )
        .collect()
    )
    n_total = sum(r.n for r in per_dom)
    # sum over domains of n_d * rate_d == N (the mixture conserves mass)
    assert abs(sum(r.n * r.rate for r in per_dom) - n_total) < 0.01 * n_total
    by_n = sorted(per_dom, key=lambda r: r.n)
    # smaller domains get strictly higher per-doc rates under alpha<1
    rates = [r.rate for r in by_n]
    assert rates == sorted(rates, reverse=True)
    for r in per_dom:
        assert abs(r.realized - r.n * r.rate) <= max(2, 0.05 * r.n * r.rate), r
    mix.unpersist()


def test_aqe_skew_join_splits_flagship_shape(spark):
    """The flagship's 100x-scale pressure point is its ONE big shuffle: the
    status-history self-join on collision_id (plans/valid_collisions.py
    status_on_cutoff).  A hot collision (bot-generated events, replayed
    feeds) floods a single reducer unless AQE's skew-join splitting engages.
    This witnesses exactly that: a skewed fixture joined with the flagship's
    equi+range shape must show `skew=true` in the FINAL adaptive plan —
    i.e. the hot partition was split at runtime, per-reducer work bounded.

    Thresholds are lowered to make the megabyte-scale fixture exhibit what
    a 100-TB hot key exhibits under the production defaults; the session
    conf (session.SCALE_CONF) already enables skewJoin there."""
    keys = [
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8192")
        # force a shuffled join: the point is reducer-side skew, which a
        # broadcast of the small dim would simply hide
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        pad = F.lpad(F.lit("x"), 96, "x")
        hot = spark.range(60_000).select(
            F.lit(1).cast("long").alias("collision_id"),
            (F.col("id") % 1000).cast("int").alias("coll_status_type_id"),
            F.to_timestamp(F.lit("2020-06-15 12:00:00")).alias("effective_date"),
            pad.alias("payload"),
        )
        cold = spark.range(20_000).select(
            (F.col("id") % 1000 + 2).cast("long").alias("collision_id"),
            (F.col("id") % 7).cast("int").alias("coll_status_type_id"),
            F.to_timestamp(F.lit("2020-03-01 08:00:00")).alias("effective_date"),
            pad.alias("payload"),
        )
        history = hot.unionByName(cold)
        cutoff = spark.range(1, 1002).select(
            F.col("id").cast("long").alias("collision_id"),
            F.to_date(F.lit("2021-04-01")).alias("cutoff_end_date"),
        )
        joined = history.join(cutoff, "collision_id", "inner").filter(
            F.col("effective_date").cast("date") <= F.col("cutoff_end_date")
        )
        # collect() (not count()) so THIS DataFrame's QueryExecution is the
        # one that runs — count() wraps a new plan whose adaptive state we
        # could not inspect afterwards
        n = len(joined.collect())
        assert n == 80_000  # hot key (60k) + every cold key present in dim
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, (
            "AQE did not split the skewed partition:\n" + plan[:2000]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
