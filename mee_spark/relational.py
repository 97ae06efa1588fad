"""Relational operator parity with the reference's dataflow (SURVEY.md §2),
expressed over the TPC-H-ish test tables.

mee executes every one of these row-at-a-time over MySQL (one SELECT per
row, `modules/handlers/v1/commonhandler.py:250-271,388-418`); here each is
one declarative DataFrame plan — Catalyst broadcast-joins the small dims,
pushes filters to the scan, and runs partial aggregation map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookup_join(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """J1 — correlated lookup join (mee slave-item fetch,
    `commonhandler.py:349-365`: per-master `select * … where fk=%id
    LIMIT 1`) → a single broadcast-hash left join with the mapping
    projection/rename (P1, `handlerconfig.py:398-439`) and null
    defaulting (P3, `commonhandler.py:1371-1387`)."""
    return (
        orders.join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"], "left")
        .select(
            F.col("o_orderkey").cast("long").alias("order_id"),
            F.col("o_custkey").cast("long").alias("customer_id"),
            F.coalesce(F.col("c_name"), F.lit("unknown")).alias("customer_name"),
            F.round(F.col("o_totalprice"), 2).alias("total_price"),
        )
    )


def multihop_join(lineitem: DataFrame, orders: DataFrame, customer: DataFrame,
                  nation: DataFrame) -> DataFrame:
    """J2 — multi-hop dependency join chain (mee item→item refs,
    `handlerconfig.py:220-254`): lineitem→orders→customer→nation with a
    grouped rollup. Dim sides broadcast; the single big-table shuffle is
    the groupBy."""
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


def nested_collect(orders: DataFrame, lineitem: DataFrame, cap: int = 50) -> DataFrame:
    """J3/A3 — nested one-to-many array build (mee `getNestedData`,
    `commonhandler.py:367-386`, ≤50 children `:242-248`): children
    collected as a sorted array per parent; emitted string-joined so the
    result is order-insensitively comparable across engines."""
    child = lineitem.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.slice(F.array_sort(F.collect_list(F.col("l_partkey").cast("long"))), 1, cap),
                lambda x: x.cast("string")), ",").alias("part_keys"),
        F.count("*").cast("long").alias("n_items"),
    )
    return (
        orders.join(child, orders["o_orderkey"] == child["l_orderkey"], "left")
        .select(
            F.col("o_orderkey").cast("long").alias("order_id"),
            F.coalesce(F.col("n_items"), F.lit(0)).cast("long").alias("n_items"),
            F.coalesce(F.col("part_keys"), F.lit("")).alias("part_keys"),
        )
    )


def filter_predicates(lineitem: DataFrame) -> DataFrame:
    """F1 — the reference's full predicate surface (`commonhandler.py:
    1398-1444`): ==, !=, >, >=, <, <=, IN-list, conjunction — pushed to
    the Parquet scan by Catalyst instead of evaluated per row."""
    return (
        lineitem.filter(
            (F.col("l_returnflag") != "R")
            & F.col("l_linestatus").isin("O", "F")
            & (F.col("l_quantity") >= 5)
            & (F.col("l_quantity") < 45)
            & (F.col("l_discount") > 0.01)
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").cast("long").alias("n_rows"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
    )


def decorrelated_count(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """A1 — mee's per-row correlated COUNT subquery (`modules/handlers/
    common.py:150-169`) decorrelated into groupBy + left join (zero-order
    customers kept with count 0)."""
    cnt = orders.filter(F.col("o_orderstatus") != "F").groupBy("o_custkey").agg(
        F.count("*").cast("long").alias("n_open"))
    return (
        customer.join(cnt, customer["c_custkey"] == cnt["o_custkey"], "left")
        .select(
            F.col("c_custkey").cast("long").alias("customer_id"),
            F.coalesce(F.col("n_open"), F.lit(0)).cast("long").alias("n_open_orders"),
        )
    )


def scalar_folds(lineitem: DataFrame) -> DataFrame:
    """A2 — the composable scalar folds sum/min/max/abs + sign
    (`modules/handlers/common.py:43-148`), e.g. the reference's
    `sum(min(credit_line, sum(reward,event)), -loan)` shape."""
    return lineitem.select(
        F.col("l_orderkey").cast("long").alias("order_id"),
        F.col("l_linenumber").cast("long").alias("line_no"),
        F.round(
            F.least(F.col("l_extendedprice"),
                    F.col("l_quantity") * 1000.0 + F.col("l_tax") * 100.0)
            + (-F.col("l_discount") * 50.0), 6
        ).alias("folded"),
        F.round(F.abs(F.col("l_discount") - F.col("l_tax")), 6).alias("abs_diff"),
        F.round(F.greatest(F.col("l_discount"), F.col("l_tax")), 6).alias("max_rate"),
    )


def topk_per_group(orders: DataFrame, k: int = 3) -> DataFrame:
    """W/L — per-group top-k (the ORDER BY/limit surface the reference
    delegates to ES relevance): row_number window, deterministic ties."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(F.col("o_custkey").cast("long").alias("customer_id"), "rank",
                F.col("o_orderkey").cast("long").alias("order_id"),
                F.round(F.col("o_totalprice"), 2).alias("total_price"))
    )


def selfjoin_roles(events: DataFrame) -> DataFrame:
    """J4 — self-join by role (mee: two config items on the same
    `auditor_relations` table with different `role` predicates,
    `conf/handlers/index_carteam_user.yml:69,90`): two filtered
    projections of ONE table, both joined to the master key."""
    purchases = events.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.round(F.sum("value"), 2).alias("purchase_total"))
    clicks = events.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.count("*").cast("long").alias("click_count"))
    users = events.select("user_id").distinct()
    return (
        users.join(purchases, "user_id", "left").join(clicks, "user_id", "left")
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.coalesce(F.col("purchase_total"), F.lit(0.0)).alias("purchase_total"),
            F.coalesce(F.col("click_count"), F.lit(0)).cast("long").alias("click_count"),
        )
    )


def _cdc_op():
    """Event-type → CDC-op mapping shared by the CDC operators (mee's
    12-way event matrix collapsed to the op axis)."""
    return (
        F.when(F.col("event_type") == "purchase", "INSERT")
        .when(F.col("event_type") == "click", "UPDATE")
        .when(F.col("event_type") == "view", "UPDATE")
        .when(F.col("event_type") == "signup", "DELETE")
        .otherwise("OTHER")
    )


def cdc_trigger(events: DataFrame, trigger: str = "~DELETE") -> DataFrame:
    """F3 — the trigger GRAMMAR end-to-end (mee `parseTrigger`,
    `modules/handlers/__init__.py:10-52`): parse ``ALL`` / ``X|Y`` / ``~X``
    into the op set and keep only events whose CDC op fires. Round 1
    hardcoded the op filter; this runs the actual grammar."""
    from mee_spark.triggers import trigger_filter

    return (
        events.select(F.col("event_id").cast("long").alias("event_id"),
                      _cdc_op().alias("op"))
        .filter(trigger_filter(F.col("op"), trigger))
    )


def date_arithmetic(events: DataFrame) -> DataFrame:
    """2.7 date/time scalars over event time (mee `utils/timeutil.py`):
    day truncation, ``yesterday``, ``deltatotime('+1 week')`` and
    ``deltatotime('-1 month')`` — emitted as formatted strings so the
    values are engine-portable byte-for-byte."""
    from mee_spark.timeops import delta_col, yesterday_col

    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
        F.date_format(yesterday_col(F.col("ts")), "yyyy-MM-dd").alias("yesterday"),
        F.date_format(delta_col(F.col("ts"), "+1 week"),
                      "yyyy-MM-dd HH:mm:ss").alias("plus_week"),
        F.date_format(delta_col(F.col("ts"), "-1 month"),
                      "yyyy-MM-dd HH:mm:ss").alias("minus_month"),
    )


def date_ranges(events: DataFrame) -> DataFrame:
    """2.7 ``rangePeriod``: per user, the inclusive day list spanning
    first→last event, exploded to rows (the reference expands such day
    lists to drive date-partitioned scans; here Catalyst explodes them
    executor-side — no driver loop)."""
    from mee_spark.timeops import range_period_col

    spans = events.groupBy(F.col("user_id").cast("long").alias("user_id")).agg(
        F.min(F.to_date("ts")).alias("d0"), F.max(F.to_date("ts")).alias("d1"))
    return spans.select(
        "user_id",
        F.explode(range_period_col(F.col("d0"), F.col("d1"))).alias("_day"),
    ).select("user_id", F.date_format("_day", "yyyy-MM-dd").alias("day"))


def cdc_normalize(events: DataFrame) -> DataFrame:
    """F3/F4 — trigger filtering + op normalization (mee `parseTrigger`
    `modules/handlers/__init__.py:10-52` and the UPDATE filter-transition
    rewrite `commonhandler.py:549-585`): event types map onto CDC ops;
    an UPDATE crossing the value-threshold 'filter' becomes INSERT/DELETE."""
    op = _cdc_op()
    passes = F.col("value") > 10.0
    normalized = (
        F.when((op == "UPDATE") & passes, "INSERT")
        .when((op == "UPDATE") & ~passes, "DELETE")
        .otherwise(op)
    )
    return (
        events.select(F.col("event_id").cast("long").alias("event_id"),
                      op.alias("op"), normalized.alias("normalized_op"))
        .filter(F.col("op").isin("INSERT", "UPDATE", "DELETE"))
    )


def diff_lag(events: DataFrame) -> DataFrame:
    """J5/W1 — before/after diff (mee `_getDiffFields`,
    `commonhandler.py:164-170`) + the keyset `__last` binding
    (`commonhandler.py:254-267`) as a lag window: per user, flag events
    whose value changed vs the previous event."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("value").over(w)
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.round(F.coalesce(prev, F.lit(0.0)), 6).alias("prev_value"),
        F.when(prev.isNull(), F.lit("FIRST"))
        .when(prev != F.col("value"), F.lit("CHANGED"))
        .otherwise(F.lit("SAME")).alias("change"),
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event sessionization — the classic lag-gap pattern: per user,
    order by event time, start a new session whenever the gap to the
    previous event exceeds ``gap_minutes``; session_id = running count of
    session starts. The standard clickstream/training-log windowing
    primitive (beyond the reference, which applies events row-at-a-time).

    Scale shape: one shuffle on user_id (the window partition key); no
    global ordering anywhere — each user's timeline sorts within its
    partition. Skewed power users are bounded by per-user event counts,
    not corpus size."""
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    # parquet timestamps arrive as TIMESTAMP_NTZ, which has no direct
    # long cast; the intermediate timestamp cast gives truncated epoch
    # seconds (mirrored by floor(epoch(ts)) in the oracle SQL)
    epoch_s = F.col("ts").cast("timestamp").cast("long")
    gap_sec = epoch_s - F.lag(epoch_s).over(w)
    is_start = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        "ts",
        is_start.alias("_s"),
    ).withColumn(
        "session_id",
        F.sum("_s").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ).cast("long"),
    ).drop("_s")


def rolling_stats(events: DataFrame, n_preceding: int = 4) -> DataFrame:
    """Per-user rolling aggregates over the last ``n_preceding``+1 events
    (ROWS window): moving average and running max of ``value`` — the
    feature-engineering window family (mee has no window functions at
    all; its `__last` keyset binding is the 1-row special case).

    Same single user_id shuffle as sessionize; ROWS frames are
    O(frame) per row with Spark's sliding aggregation."""
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts").asc(), F.col("event_id").asc())
         .rowsBetween(-n_preceding, 0))
    return events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("user_id"),
        F.round(F.avg("value").over(w), 6).alias("moving_avg"),
        F.round(F.max("value").over(w), 6).alias("running_max"),
        F.count("*").over(w).cast("long").alias("frame_n"),
    )
