"""Registry wave 2: relational query surface (SURVEY.md section 2.5).

The sink of the reference pipeline is a fully queryable ClickHouse
table (setup.sh:177,180); capability parity therefore includes the
standard relational algebra, expressed here over the driver's star
schema with built-in Spark only — Catalyst/AQE does all optimization.

Cross-engine determinism rules used throughout (driver hashes values):
- money aggregations: scale the per-row double to integer cents with
  round() (same binary double -> same integer in both engines), SUM
  as BIGINT (exact, order-independent), divide back by 100 at the
  end (one IEEE division on identical inputs).  A DECIMAL cast of an
  arbitrary double is NOT portable — DuckDB and Spark round the last
  decimal digit differently;
- integral-valued doubles (l_quantity) may cast to DECIMAL directly;
- averages: exact integer SUM cast to double, then divided — every
  intermediate identical on both sides;
- row-level double arithmetic (x*(1-y), abs, sqrt) is bit-identical
  across engines and needs no rounding;
- top-k always tie-broken by a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


DEC = "decimal(18,6)"


# ---------------------------------------------------------------------------
# sort / limit


@register(
    "q_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k (reference pattern setup.sh:180,58,64).

    Catalyst plans TakeOrderedAndProject: per-partition heap of k rows,
    no global sort — the 100 TB-safe top-k.
    """
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# joins


@register(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; customer is the broadcast side at any scale."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    customer = _t(spark, sf_dir, "customer")
    return orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "q_join_multi",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(SUM(CAST(round((l.l_extendedprice * (1 - l.l_discount)) * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join -> revenue per region/nation (TPC-H Q5 shape).

    Scale design: fact table (lineitem) shuffles once on l_orderkey for
    the orders join; every dimension (customer at 1.5k..15M rows,
    nation, region) broadcasts, so there is exactly ONE big shuffle.
    """
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    cents = F.round((F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100).cast(
        "long"
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            (F.sum(cents).cast("double") / 100).alias("sum_revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, coalesce(b.n_big, 0) AS n_big_orders
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, COUNT(*) AS n_big FROM orders
      WHERE o_totalprice > 400000 GROUP BY o_custkey
    ) b ON c.c_custkey = b.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with aggregate-before-join (shuffle the small side)."""
    c = _t(spark, sf_dir, "customer")
    big = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return c.join(big, c.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "c_name", F.coalesce("n_big", F.lit(0)).alias("n_big_orders")
    )


@register(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join: customers with a pending order (left_semi)."""
    c = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(pending, c.c_custkey == pending.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join: customers without pending orders (left_anti)."""
    c = _t(spark, sf_dir, "customer")
    pending = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(pending, c.c_custkey == pending.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q_join_range",
    oracle="""
    SELECT o.o_orderkey, l.l_linenumber, l.l_shipdate
    FROM orders o
    JOIN lineitem l
      ON l.l_orderkey = o.o_orderkey
     AND l.l_shipdate >= o.o_orderdate
     AND l.l_shipdate <  o.o_orderdate + INTERVAL 60 DAY
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range residual join: items shipped within 60 days of order.

    The equi component keeps it a sort-merge/shuffle-hash join at scale;
    the range predicate is evaluated as a cheap residual — never a BNL.
    """
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return o.join(
        l,
        (l.l_orderkey == o.o_orderkey)
        & (l.l_shipdate >= o.o_orderdate)
        & (l.l_shipdate < F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
    ).select("o_orderkey", "l_linenumber", "l_shipdate")


@register(
    "q_join_interval",
    oracle="""
    SELECT a.event_id AS id1, b.event_id AS id2, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 60000000
    """,
)
def q_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval join (events of one user within 60 s of each other)
    via the time-bucket expansion pattern.

    Scale design: instead of a quadratic theta-join, each left row is
    expanded to its 3 candidate 60 s buckets and joined EQUI on
    (user_id, bucket) — O(n) shuffle, no BNL; the exact |dt|<=60 s
    predicate is a residual filter.  Each qualifying pair meets in
    exactly one bucket (the right row's own), so no dedup is needed.
    """
    e = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("us")
    )
    bucket = F.floor(F.col("us") / F.lit(60_000_000))
    left = e.withColumn("b", F.explode(F.array(bucket - 1, bucket, bucket + 1)))
    right = e.withColumn("b", bucket)
    a, b = left.alias("a"), right.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.abs(F.col("a.us") - F.col("b.us")) <= 60_000_000),
        )
        .select(
            F.col("a.event_id").alias("id1"),
            F.col("b.event_id").alias("id2"),
            F.col("a.user_id").alias("user_id"),
        )
    )


@register(
    "q_join_asof",
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, ts, event_type,
             max(CASE WHEN event_type = 'click' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS last_click_ts
      FROM events
    )
    SELECT event_id, user_id, ts, last_click_ts
    FROM w WHERE event_type = 'purchase'
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest click at-or-before each purchase, per user.

    Idiomatic Spark as-of: union-style single pass with a running
    window maximum — ONE shuffle by user_id, no per-key join blow-up
    (the naive join+filter is quadratic per key at 100 TB).
    """
    e = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("ts"))
    ).over(w)
    return (
        e.withColumn("last_click_ts", last_click)
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


# ---------------------------------------------------------------------------
# aggregates


@register(
    "q_agg_basic",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_base_price,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash aggregate sum/avg/min/max/count by group (TPC-H Q1 shape).

    Partial aggregation map-side; 6 groups survive the shuffle.
    l_quantity is integral-valued, so it sums exactly as BIGINT and the
    DOUBLE cast of the sum is a single identical conversion on both
    engines (a DECIMAL sum is NOT portable: Spark widens to
    DECIMAL(28,6), DuckDB to DECIMAL(38,6), and the driver's hasher
    does not canonicalize Decimal objects — r1 hash FAIL).
    """
    l = _t(spark, sf_dir, "lineitem")
    qty_int = F.round(F.col("l_quantity")).cast("long")
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty_int).cast("double").alias("sum_qty"),
        (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).cast("double") / 100).alias(
            "sum_base_price"
        ),
        (F.sum(qty_int).cast("double") / F.count("*")).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.count("*").alias("count_order"),
    )


@register(
    "q_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (Spark expands to a two-phase agg)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


@register("q_agg_approx_distinct", oracle=None)  # no exact oracle by design
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct — the 100 TB path where exact
    distinct's shuffle would dominate; rows-only check by design
    (Spark's sketch is opaque).  The register-level algorithm itself
    IS exactly oracle-checked: see q_hll_registers, which rebuilds a
    p=8 HLL from public md5/nibble arithmetic and hash-matches every
    register against DuckDB."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


@register(
    "q_agg_stringagg",
    oracle="""
    SELECT n.n_name, string_agg(c.c_name, ', ' ORDER BY c.c_name) AS members
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal > 9900
    GROUP BY n.n_name
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (reference string_agg, setup.sh:62)."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9900)
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.array_join(F.array_sort(F.collect_list("c_name")), ", ").alias("members"))
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals; scaled-int sum for cross-engine hash
    exactness (same rationale as q_agg_basic — r1 hash FAIL on the
    DECIMAL sum)."""
    l = _t(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "q_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("n"))


@register(
    "q_grouping_sets",
    oracle="""
    SELECT event_type, user_id, COUNT(*) AS n
    FROM events GROUP BY GROUPING SETS ((event_type), (user_id), ())
    """,
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    e.createOrReplaceTempView("gs_events")
    return spark.sql(
        """
        SELECT event_type, user_id, COUNT(*) AS n
        FROM gs_events GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    )


# ---------------------------------------------------------------------------
# windows


@register(
    "q_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_orderkey, o_orderstatus, o_totalprice,
             CAST(row_number()  OVER w AS INTEGER) AS rn,
             CAST(rank()        OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INTEGER) AS rnk,
             CAST(dense_rank()  OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS INTEGER) AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
    ) WHERE rn <= 5
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows + top-n per group (same machinery as q_dedup_lww)."""
    o = _t(spark, sf_dir, "orders")
    by_price = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    stable = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderstatus",
            "o_totalprice",
            F.row_number().over(stable).alias("rn"),
            F.rank().over(by_price).alias("rnk"),
            F.dense_rank().over(by_price).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
    )


@register(
    "q_window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100 AS running_spend
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead + running sum with an explicit rows frame."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).over(wf).cast("double")
            / 100
        ).alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# set operations


@register(
    "q_union",
    oracle="""
    SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
    UNION ALL
    SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS src FROM supplier
    """,
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("src"),
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return c.unionByName(s)


@register(
    "q_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct set difference): nations with customers but no
    high-balance supplier."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# ---------------------------------------------------------------------------
# scalar expressions


@register(
    "q_case_expr",
    oracle="""
    SELECT CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                WHEN c_acctbal < 9000 THEN 'mid'
                ELSE 'high' END AS tier,
           COUNT(*) AS n
    FROM customer GROUP BY 1
    """,
)
def q_case_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE expression (the reference's type-map CASE, setup.sh:40-49)."""
    c = _t(spark, sf_dir, "customer")
    tier = (
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .when(F.col("c_acctbal") < 9000, "mid")
        .otherwise("high")
    )
    return c.groupBy(tier.alias("tier")).agg(F.count("*").alias("n"))


@register(
    "q_coalesce",
    oracle="""
    SELECT c.c_custkey,
           coalesce(o.first_priority, 'NONE') AS first_priority
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, arg_min(o_orderpriority, o_orderkey) AS first_priority
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def q_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE fallback over a nullable join (reference setup.sh:64)."""
    c = _t(spark, sf_dir, "customer")
    first = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"))
    )
    return c.join(first, c.c_custkey == first.o_custkey, "left").select(
        "c_custkey", F.coalesce("first_priority", F.lit("NONE")).alias("first_priority")
    )


@register(
    "q_scalar_string",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_upper,
           substring(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           CAST(length(p_name) AS INTEGER) AS name_len,
           (p_type LIKE '%BRASS%') AS is_brass,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word
    FROM part
    """,
)
def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.regexp_extract("p_type", r"([A-Z]+)$", 1).alias("last_word"),
    )


@register(
    "q_scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           date_trunc('month', o_orderdate) AS month_bucket,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since_epoch95
    FROM orders
    """,
)
def q_scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_trunc("month", "o_orderdate").alias("month_bucket"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_epoch95"
        ),
    )


@register(
    "q_scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           abs(l_discount - 0.05) AS disc_dev,
           l_linenumber % 3 AS line_mod,
           sqrt(l_quantity) AS qty_sqrt
    FROM lineitem
    """,
)
def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level double arithmetic is bit-identical across engines."""
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        (F.col("l_linenumber") % 3).alias("line_mod"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
    )


@register(
    "q_array_ops",
    oracle="""
    WITH e AS (
      SELECT vec_id, len(embedding) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_val,
             unnest(embedding) AS x
      FROM embeddings
    )
    SELECT vec_id, CAST(any_value(dim) AS INTEGER) AS dim, any_value(first_val) AS first_val,
           CAST(SUM(CAST(round((CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS norm2
    FROM e GROUP BY vec_id
    """,
)
def q_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column: size, index, explode,
    exact (decimal) squared-norm so the hash compare is precise."""
    e = _t(spark, sf_dir, "embeddings")
    x = F.explode("embedding").alias("x")
    expl = e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        x,
    )
    sq_micro = F.round(
        (F.col("x").cast("double") * F.col("x").cast("double")) * 1_000_000
    ).cast("long")
    return expl.groupBy("vec_id").agg(
        F.any_value("dim").alias("dim"),
        F.any_value("first_val").alias("first_val"),
        (F.sum(sq_micro).cast("double") / 1_000_000).alias("norm2"),
    )


@register(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction from the events.props JSON string."""
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@register(
    "q_subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice = (SELECT max(o_totalprice) FROM orders)
    """,
)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (reference setup.sh:64 pattern): rows matching a
    single aggregated value, via broadcast of the 1-row aggregate."""
    o = _t(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_totalprice").alias("mx"))
    return (
        o.join(F.broadcast(mx), o.o_totalprice == mx.mx)
        .select("o_orderkey", "o_totalprice")
    )


@register(
    "q_distinct",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


@register(
    "q_having",
    oracle="""
    SELECT p_brand, COUNT(*) AS n FROM part
    GROUP BY p_brand HAVING COUNT(*) > 5
    """,
)
def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand").agg(F.count("*").alias("n")).filter(F.col("n") > 5)
    )


@register(
    "q_pivot",
    oracle="""
    SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (crosstab): order counts by priority x status.  Spark's
    pivot with an explicit value list stays a single hash aggregate —
    no second pass to discover pivot values."""
    o = _t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in ["F", "O", "P"]],
    )


@register(
    "q_agg_minmax_by",
    oracle="""
    SELECT o_custkey,
           arg_max(o_orderpriority, o_orderkey) AS last_priority,
           arg_min(o_orderpriority, o_orderkey) AS first_priority,
           MIN(o_orderdate) AS first_date,
           MAX(o_totalprice) AS top_price
    FROM orders GROUP BY o_custkey
    """,
)
def q_agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by keyed by the unique order key (deterministic) —
    the same primitive that powers the LWW upsert."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderpriority", "o_orderkey").alias("last_priority"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_totalprice").alias("top_price"),
    )


@register(
    "q_median",
    oracle="""
    SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median.  0.5 is the one quantile whose
    interpolation ((a+b)/2 on integral doubles) is IEEE-identical
    across engines; other fractions interpolate with different
    formulas and would not hash-match."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("median_qty")
    )


@register(
    "q_in_between",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 20
    """,
)
def q_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        F.col("l_returnflag").isin("A", "R") & F.col("l_quantity").between(10, 20)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


# ---------------------------------------------------------------------------
# wave 5: window frames, conditional aggregation, reshaping


@register(
    "q_ntile",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(ntile(4) OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal, c_custkey) AS INTEGER) AS balance_quartile
    FROM customer
    """,
)
def q_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing (balance quartiles per nation).

    Partitioned by nation so each window sorts independently — no
    global total order, which is what makes NTILE usable at 100 TB.
    Deterministic: the ORDER BY is tie-broken by the unique key.
    """
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey", "c_nationkey", "c_acctbal",
        F.ntile(4).over(w).alias("balance_quartile"),
    )


@register(
    "q_window_frame_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY datediff('day', DATE '1970-01-01', o_orderdate)
             RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS rev_30d
    FROM orders
    """,
)
def q_window_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame: per-customer trailing-30-day revenue.

    The frame is value-based (epoch days), not row-based, so multiple
    same-day orders are peers and the trailing month is exact.  Money
    summed as integer cents (see module docstring).
    """
    o = _t(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(days)
        .rangeBetween(-30, Window.currentRow)
    )
    return o.select(
        "o_custkey", "o_orderkey", "o_orderdate",
        (F.sum(cents).over(w).cast("double") / 100).alias("rev_30d"),
    )


@register(
    "q_agg_filter",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
             FILTER (WHERE l_tax > 0.04) AS BIGINT) AS taxed_cents
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (SQL FILTER clause) — one pass computes
    unconditional and predicated aggregates together; map-side partial
    aggregation keeps the shuffle one row per group."""
    l = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return l.groupBy("l_returnflag").agg(
        F.count("*").alias("n_all"),
        F.count(F.when(F.col("l_discount") > 0.05, 1)).alias("n_discounted"),
        F.sum(F.when(F.col("l_tax") > 0.04, cents)).alias("taxed_cents"),
    )


@register(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'extended' AS component,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
    FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'discount',
           CAST(round(l_discount * 100) AS BIGINT) FROM lineitem WHERE l_linenumber = 1
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'tax',
           CAST(round(l_tax * 100) AS BIGINT) FROM lineitem WHERE l_linenumber = 1
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt wide columns to long (inverse of q_pivot) via the
    stack() generator — one scan, rows expand 3x map-side, no shuffle
    (the oracle spells it as UNION ALL, which scans 3x)."""
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3,"
            " 'extended', CAST(round(l_extendedprice * 100) AS BIGINT),"
            " 'discount', CAST(round(l_discount * 100) AS BIGINT),"
            " 'tax',      CAST(round(l_tax * 100) AS BIGINT)"
            ") AS (component, cents)"
        ),
    )


@register(
    "q_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS first_order,
           last_value(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_order,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_order
    FROM orders
    """,
)
def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value navigation over an ordered window; the
    full-partition ROWS frame makes last/nth well-defined, and the
    unique-key tie-break makes every value deterministic."""
    o = _t(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey", "o_orderkey",
        F.first("o_orderkey").over(wo).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
    )


@register(
    "q_skew_salted",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100
             AS sum_price,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: two-phase salted groupBy.

    Phase 1 groups by (key, salt = l_orderkey % 16) so a hot key's
    rows spread over 16 reducers; phase 2 merges the 16 partials per
    key.  Integer partial sums make the rewrite EXACTLY equal to the
    direct groupBy (the oracle is the plain one-phase SQL).  This is
    the salting pattern for keys too hot for AQE's skew handling —
    at 100 TB a 3-value grouping key like l_returnflag is exactly
    such a key.
    """
    l = _t(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    partial = (
        l.groupBy("l_returnflag", (F.col("l_orderkey") % 16).alias("_salt"))
        .agg(F.sum(cents).alias("c"), F.count("*").alias("n"))
    )
    return partial.groupBy("l_returnflag").agg(
        (F.sum("c").cast("double") / 100).alias("sum_price"),
        F.sum("n").alias("n_rows"),
    )


@register(
    "q_distinct_sketch",
    oracle="""
    SELECT COUNT(DISTINCT substring(md5(CAST(o_custkey AS VARCHAR)), 1, 4))
             AS n_buckets,
           COUNT(DISTINCT o_custkey) AS n_exact
    FROM orders
    """,
)
def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic cardinality sketch: linear counting over a 16^4
    md5-prefix bucket space.  The sufficient statistic (occupied
    buckets) is an integer, so unlike approx_count_distinct (engine-
    specific HLL, rows-only check) this sketch is value-exact across
    engines; the estimate is recovered downstream as
    -m*ln(1 - n_buckets/m).  At 100 TB the sketch is one partial-agg'd
    COUNT DISTINCT over 4-char keys — bounded state per partition.
    """
    o = _t(spark, sf_dir, "orders")
    bucket = F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 4)
    return o.agg(
        F.countDistinct(bucket).alias("n_buckets"),
        F.countDistinct("o_custkey").alias("n_exact"),
    )


# ---------------------------------------------------------------------------
# wave 27 (r3): remaining ANSI surface — nth/offset windows, string
# breadth, error-safe arithmetic


@register(
    "q_window_nth",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice,
           nth_value(o_totalprice, 3) OVER w AS third_price,
           lead(o_totalprice, 2) OVER w AS price_2ahead,
           lag(o_totalprice, 3) OVER w AS price_3back
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_window_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value and multi-offset lead/lag — the remaining ANSI window
    navigation functions (q_window_analytic covers lead/lag offset 1,
    q_first_last covers first/last).  Deterministic: the window order
    is tie-broken by the unique key, and nth_value runs over the
    running frame so each row sees a well-defined prefix.

    100 TB plan: one status-partitioned sort window; no global
    order."""
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "o_totalprice",
        F.nth_value("o_totalprice", 3).over(w).alias("third_price"),
        F.lead("o_totalprice", 2).over(wo).alias("price_2ahead"),
        F.lag("o_totalprice", 3).over(wo).alias("price_3back"),
    )


@register(
    "q_string_funcs2",
    oracle="""
    SELECT p_partkey,
           split_part(p_type, ' ', 2) AS type_mid,
           translate(p_brand, '#', '-') AS brand_dashed,
           repeat(left(p_name, 1), 3) AS name_trip,
           reverse(p_brand) AS brand_rev,
           CAST(strpos(p_name, 'o') AS INTEGER) AS first_o,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad
    FROM part
    """,
)
def q_string_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second string-function breadth key: split_part, translate,
    repeat, reverse, strpos/instr, lpad — the manipulation surface
    q_scalar_string (upper/substring/concat/length/like/regexp) does
    not touch.  All per-row codegen expressions."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("type_mid"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.repeat(F.substring("p_name", 1, 1), 3).alias("name_trip"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr("p_name", "o").cast("int").alias("first_o"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_pad"),
    )


@register(
    "q_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           try_cast(l_returnflag AS INTEGER) AS flag_as_int,
           CAST(l_quantity AS BIGINT) // NULLIF(l_linenumber - 1, 0) AS qty_per_prev,
           try_cast(CASE WHEN l_quantity > 30 THEN 'big' END AS INTEGER) AS null_path
    FROM lineitem WHERE l_orderkey % 13 = 0
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression semantics: try_cast of non-numeric text,
    division whose denominator can be zero (NULL, never an exception
    — Spark ``try_divide`` == SQL ``// NULLIF``), and try_cast of a
    NULL branch — the ingestion-hardening surface q_null_semantics
    (comparisons) does not cover.  A malformed cell must become NULL
    identically in both engines, not kill the job.

    100 TB plan: per-row codegen behind a pushed modulo filter."""
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(F.col("l_orderkey") % 13 == 0).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("try_cast(l_returnflag AS INT)").alias("flag_as_int"),
        F.try_divide(
            F.col("l_quantity").cast("long"), F.col("l_linenumber") - 1
        ).cast("long").alias("qty_per_prev"),
        F.expr(
            "try_cast(CASE WHEN l_quantity > 30 THEN 'big' END AS INT)"
        ).alias("null_path"),
    )
