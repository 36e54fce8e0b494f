"""§2.C — joins: equi (all join types), broadcast, cross, theta/range,
interval self-join, as-of, multiway star, self-join.

Scale notes (SURVEY.md §7.4):
- Dimension tables (region/nation/customer/part/supplier) get explicit
  F.broadcast hints in star joins — no shuffle of the fact side's dimension.
- Fact-fact equi joins shuffle on the join key; AQE splits skewed keys.
- Range/interval joins put the equi part in the join keys so Spark only
  sort-merges on the key and applies the range as a join condition — never a
  cartesian product.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import money_sum, sql_money_sum
from ..io import load
from ..registry import register


@register(
    "join_inner_hash",
    oracle="""
SELECT o_orderkey, c_custkey, c_name, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
    tier="T1",
)
def join_inner_hash(spark, sf_dir):
    """Equi inner join orders ⋈ customer (Catalyst picks SHJ/SMJ/broadcast)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name", "o_totalprice"
    )


@register(
    "join_broadcast",
    oracle=f"""
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       {sql_money_sum('l_extendedprice')} AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
""",
    tier="T1",
)
def join_broadcast(spark, sf_dir):
    """Fact ⋈ broadcast(dim): lineitem ⋈ part, revenue per brand.

    The broadcast hint keeps the 100 TB fact table un-shuffled; only the
    small dim ships to every executor.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum(F.col("l_extendedprice")).alias("revenue"),
        )
    )


@register(
    "join_left_outer",
    oracle="""
SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    tier="T1",
)
def join_left_outer(spark, sf_dir):
    """Left outer join: order count per customer, 0 for order-less customers."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_right_outer",
    oracle="""
SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey
""",
    tier="T2",
)
def join_right_outer(spark, sf_dir):
    """Right outer mirror of join_left_outer."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    oracle="""
WITH rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 9000),
     big  AS (SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 400000)
SELECT rich.c_custkey AS rich_key, big.o_custkey AS big_key
FROM rich FULL JOIN big ON rich.c_custkey = big.o_custkey
""",
    tier="T2",
)
def join_full_outer(spark, sf_dir):
    """Full outer join on two key sets with gaps on both sides."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    big = o.filter(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return rich.join(big, rich.c_custkey == big.o_custkey, "full").select(
        F.col("c_custkey").alias("rich_key"), F.col("o_custkey").alias("big_key")
    )


@register(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
""",
    tier="T1",
)
def join_left_semi(spark, sf_dir):
    """Customers with ≥1 urgent order (semi join — no row multiplication)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_left_anti",
    oracle="""
SELECT c_custkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    tier="T1",
)
def join_left_anti(spark, sf_dir):
    """Customers with no orders at all (anti join)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "join_cross_limited",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
    tier="T2",
)
def join_cross_limited(spark, sf_dir):
    """Bounded cartesian product (5 × 25)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "join_theta_range",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS BIGINT) AS ship_days
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate <= o_orderdate + INTERVAL 7 DAY
""",
    tier="T2",
)
def join_theta_range(spark, sf_dir):
    """Equi key + range predicate: lineitems shipped within 7 days of order."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= o.o_orderdate + F.expr("INTERVAL 7 DAYS"))
    )
    return li.join(o, cond).select(
        "l_orderkey",
        "l_linenumber",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("ship_days"),
    )


@register(
    "join_interval",
    oracle="""
SELECT a.event_id AS e1, b.event_id AS e2, a.user_id AS user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
    tier="T2",
)
def join_interval(spark, sf_dir):
    """Interval self-join: event pairs of one user within a 5-minute span.

    Scale note: the equi part (user_id) bounds the blow-up; per-user event
    streams are dense enough that the range predicate does the real pruning.
    """
    e = load(spark, sf_dir, "events")
    a = e.alias("a")
    b = e.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return e.alias("a").join(e.alias("b"), cond).select(
        F.col("a.event_id").alias("e1"),
        F.col("b.event_id").alias("e2"),
        F.col("a.user_id").alias("user_id"),
    )


@register(
    "join_interval_binned",
    oracle="""
SELECT a.event_id AS e1, b.event_id AS e2, a.user_id AS user_id
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND a.event_id < b.event_id
 AND b.ts >= a.ts
 AND b.ts <= a.ts + INTERVAL 5 MINUTE
""",
    tier="T2",
)
def join_interval_binned(spark, sf_dir):
    """The interval self-join rewritten as a BINNED EQUI join — the classic
    scale transformation: map each event to a 5-minute time bin, join on
    (user_id, bin) with the right side expanded to {bin, bin+1} (any match
    within 5 minutes lies in the same or next bin), then apply the exact
    range filter. Same oracle as join_interval — results are provably
    identical; only the plan changes.

    Scale note: the join key becomes (user, bin) — much finer than user
    alone, so hot users spread across many reducers and the per-key
    candidate set is bounded by bin width, not by a user's whole history.
    """
    e = load(spark, sf_dir, "events")
    bin_col = F.floor(F.unix_micros(F.col("ts")) / F.lit(300_000_000))
    a = e.withColumn("bin", bin_col).alias("a")
    # right side joins into its own bin and the previous one (a.bin or a.bin+1
    # seen from the left) — expand left instead: left emits {bin, bin+1}
    left = (
        e.withColumn("bin0", bin_col)
        .select(
            "*", F.explode(F.array(F.col("bin0"), F.col("bin0") + 1)).alias("bin")
        )
        .alias("a")
    )
    right = e.withColumn("bin", bin_col).alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        left.join(right, cond)
        .select(
            F.col("a.event_id").alias("e1"),
            F.col("b.event_id").alias("e2"),
            F.col("a.user_id").alias("user_id"),
        )
        .dropDuplicates(["e1", "e2"])
    )


@register(
    "join_asof",
    oracle="""
SELECT event_id, user_id,
       last_value(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
FROM events
""",
    tier="T2",
)
def join_asof(spark, sf_dir):
    """As-of (backward) join: each event picks the user's latest purchase
    value at-or-before its timestamp.

    Spark has no native ASOF JOIN; the scalable pattern is a union-tag +
    `last(..., ignorenulls)` running window (see swallow_spark.ops.asof for
    the generic two-table form). One shuffle on the partition key, no
    row-multiplying join.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pv = F.last(
        F.when(F.col("event_type") == "purchase", F.col("value")), ignorenulls=True
    ).over(w)
    return e.select("event_id", "user_id", pv.alias("last_purchase_value"))


@register(
    "join_multiway_star",
    oracle=f"""
SELECT n_name, {sql_money_sum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
WHERE r_name = 'ASIA'
GROUP BY n_name
""",
    tier="T1",
)
def join_multiway_star(spark, sf_dir):
    """TPC-H-Q5-style 5-table star join, dims broadcast, revenue per nation."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            money_sum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
    )


@register(
    "join_self",
    oracle="""
SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rkey
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
""",
    tier="T2",
)
def join_self(spark, sf_dir):
    """Self-join: unordered nation pairs within one region."""
    n = load(spark, sf_dir, "nation")
    a = n.alias("a")
    b = n.alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(
        F.col("a.n_name").alias("n1"),
        F.col("b.n_name").alias("n2"),
        F.col("a.n_regionkey").alias("rkey"),
    )


@register(
    "join_salted_skew",
    oracle=f"""
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders,
       {sql_money_sum('o_totalprice')} AS total_spend
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
    tier="T2",
)
def join_salted_skew(spark, sf_dir):
    """Skew-mitigated equi join surfaced as a query: ops.relational.
    salted_join splits each hot key across 16 salts (big side salted
    randomly, small side replicated 16x) so no single reducer owns a whole
    hot key. The join RESULT is salt-invariant, so the plain-join oracle
    checks it exactly.

    Scale note: this is the manual fallback for when AQE's
    skewJoin splitting can't help (e.g. the skew is in a single key whose
    matching build rows also don't fit); replicating the small side 16x is
    only viable because it is a true dimension."""
    from ..ops.relational import salted_join

    o = load(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "c_custkey")
    c = load(spark, sf_dir, "customer")
    joined = salted_join(o, c, key="c_custkey", n_salts=16)
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total_spend"),
    )


@register(
    "join_null_safe",
    oracle="""
WITH c AS (SELECT NULLIF(c_nationkey, 0) AS k, c_custkey FROM customer),
     s AS (SELECT NULLIF(s_nationkey, 0) AS k, s_suppkey FROM supplier)
SELECT c.k AS nationkey, COUNT(*) AS pairs
FROM c JOIN s ON c.k IS NOT DISTINCT FROM s.k
GROUP BY c.k
""",
    tier="T2",
)
def join_null_safe(spark, sf_dir):
    """Null-safe equi join (<=>): NULL keys match each other instead of
    dropping out — the semantics MERGE/dedup pipelines need when the join
    key is itself dirty. NULLIF(nationkey, 0) manufactures a NULL stripe.

    Scale note: eqNullSafe stays a hash-partitionable equi condition (NULLs
    hash to one partition — if the NULL stripe is huge, pre-split it), so
    Catalyst still picks SortMergeJoin/BHJ, never a nested loop.
    """
    c = load(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("ck"), "c_custkey"
    )
    s = load(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(0)).alias("sk"), "s_suppkey"
    )
    return (
        c.join(s, c["ck"].eqNullSafe(s["sk"]))
        .groupBy(F.col("ck").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("pairs"))
    )


@register(
    "join_argmax_rows",
    oracle="""
SELECT o_custkey,
       arg_max(o_orderkey,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000000
                 + o_orderkey) AS top_orderkey,
       CAST(arg_max(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT),
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000000
                 + o_orderkey) AS DOUBLE) / 100 AS top_price,
       arg_max(o_orderstatus,
               CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000000
                 + o_orderkey) AS top_status
FROM orders
GROUP BY o_custkey
""",
    tier="T2",
)
def join_argmax_rows(spark, sf_dir):
    """Whole-row arg-max per group WITHOUT a window: each customer's
    single largest order (key, price, status) via max_by over a packed
    deterministic tiebreak key — the aggregate formulation of 'top-1 per
    group'.

    Scale note: this is the plan-shape point of the key. The window
    top-1 shuffles EVERY fact row to its group's reducer and sorts by
    (group, order key); max_by partial-aggregates map-side — each map
    task keeps ONE candidate per group, so the exchange carries |groups|
    rows instead of |facts|. (With a string-typed max_by argument Spark
    picks SortAggregate over HashAggregate — a local group-key sort of
    the reduced data, not the window's full-data sort; the partial_max_by
    before the exchange is the load-bearing property, plan-asserted in
    tests/test_plans.py.)

    Determinism: packed key = cents·1e10 + orderkey (exact int64, ties
    impossible), same recipe as agg_argminmax.
    """
    o = load(spark, sf_dir, "orders")
    key = (
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        * F.lit(10_000_000_000)
        + F.col("o_orderkey")
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    withk = o.select("o_custkey", "o_orderkey", "o_orderstatus", cents.alias("cents"), key.alias("k"))
    return withk.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "k").alias("top_orderkey"),
        (F.max_by("cents", "k").cast("double") / 100).alias("top_price"),
        F.max_by("o_orderstatus", "k").alias("top_status"),
    )


_LATERAL_SQL = """
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
LATERAL (SELECT c_name, c_acctbal FROM customer c
         WHERE c.c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
"""


@register("join_lateral_topn", oracle=_LATERAL_SQL, tier="T2")
def join_lateral_topn(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 customers by balance per nation)
    — the SQL-standard spelling of per-group top-n, run through Spark's
    lateral-join support verbatim; DuckDB executes the identical SQL.
    Deterministic: ties broken by c_custkey inside the LATERAL ORDER BY.

    Scale notes: Catalyst decorrelates the LATERAL into a window
    (row_number ≤ 2 partitioned by nationkey) + equi join — the same plan
    win_row_number_topk declares directly, so per-nation candidate sets
    never materialize beyond the window's sort; no nested-loop
    re-execution per outer row.
    """
    load(spark, sf_dir, "nation").createOrReplaceTempView("lat_nation")
    load(spark, sf_dir, "customer").createOrReplaceTempView("lat_customer")
    return spark.sql(
        _LATERAL_SQL.replace("nation n", "lat_nation n").replace(
            "customer c", "lat_customer c"
        )
    )


_PIT_SQL = """
WITH p AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
),
v AS (
  SELECT user_id, ts AS valid_from,
         lead(ts) OVER (PARTITION BY user_id ORDER BY ts) AS valid_to,
         value
  FROM p WHERE rn = 1
)
SELECT f.event_id, f.user_id, v.value AS value_at_time
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type != 'purchase') f
LEFT JOIN v ON v.user_id = f.user_id AND f.ts >= v.valid_from
           AND (v.valid_to IS NULL OR f.ts < v.valid_to)
"""


@register("join_point_in_time", oracle=_PIT_SQL, tier="T2")
def join_point_in_time(spark, sf_dir):
    """Point-in-time (SCD2 dimension-version) join: every non-purchase
    event is matched to the purchase-value version VALID AT its timestamp
    — the warehouse spelling is a half-open interval join against
    [valid_from, valid_to) version rows (the DuckDB oracle), but the
    scalable Spark implementation is the generic union-tag as-of op
    (ops/asof.asof_join_backward): ONE shuffle on the user key, no range
    join, no per-fact candidate scan. The hash-match proves the two
    spellings equivalent, including at version boundaries (a fact AT a
    version's valid_from belongs to that version — at-or-after inclusive
    on both sides).

    Determinism: versions are deduped to one per (user, ts) (max event_id
    wins) and NULL-valued purchases are excluded from the dimension on
    BOTH sides, so `last(ignorenulls)` can never skip a matched version.

    Scale notes: at 100 TB the version table partitions on the same user
    key as the fact stream — the union-tag window is one co-partitioned
    sort, while the interval-join spelling would need binning
    (join_interval_binned) to avoid a per-user range scan.
    """
    from pyspark.sql.window import Window

    from ..ops.asof import asof_join_backward

    e = load(spark, sf_dir, "events")
    wdup = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    versions = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .withColumn("rn", F.row_number().over(wdup))
        .filter(F.col("rn") == 1)
        .select("user_id", "ts", "value")
    )
    facts = e.filter(F.col("event_type") != "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = asof_join_backward(
        facts, versions, on="user_id", ts="ts", value_cols=["value"]
    )
    return out.select(
        "event_id", "user_id", F.col("value_asof").alias("value_at_time")
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH tagged AS (
  SELECT event_id, user_id, ts,
         last_value(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                         THEN ts END IGNORE NULLS)
           OVER w AS pts,
         last_value(CASE WHEN event_type = 'purchase' AND value IS NOT NULL
                         THEN value END IGNORE NULLS)
           OVER w AS pval
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN pts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(pts) <= 7200000000
            THEN pval END AS tolerated_purchase_value
FROM tagged
""",
    tier="T2",
)
def join_asof_tolerance(spark, sf_dir):
    """As-of backward join WITH TOLERANCE (pandas merge_asof's `tolerance`
    semantics): each event picks the user's latest non-null purchase value
    at-or-before its timestamp, but only if that purchase is within 2
    hours — staler matches become NULL instead of silently joining.

    Implementation: the running `last(ignorenulls)` carries a STRUCT of
    (match ts, match value) so both fields provably come from the SAME
    purchase row (two independent last() windows could diverge when a
    purchase has NULL value); the gap test compares exact integer
    microseconds. The oracle restricts both windows to non-null-value
    purchases, which pins the identical row choice.

    Scale note: same single user_id shuffle as join_asof — tolerance is a
    post-window filter, not a join-condition change, so no extra exchange
    and no range-explosion anywhere.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last(
        F.when(
            (F.col("event_type") == "purchase") & F.col("value").isNotNull(),
            F.struct(F.col("ts").alias("pts"), F.col("value").alias("pval")),
        ),
        ignorenulls=True,
    ).over(w)
    return e.withColumn("m", m).select(
        "event_id",
        "user_id",
        F.when(
            F.col("m").isNotNull()
            & (F.unix_micros("ts") - F.unix_micros("m.pts") <= F.lit(7200000000)),
            F.col("m.pval"),
        ).alias("tolerated_purchase_value"),
    )


@register(
    "join_lateral_api",
    oracle="""
WITH ranked AS (
  SELECT c.c_nationkey, c.c_custkey,
         CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents,
         ROW_NUMBER() OVER (PARTITION BY c.c_nationkey
                            ORDER BY CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) DESC,
                                     c.c_custkey) AS rk
  FROM customer c
)
SELECT n.n_name, r.c_custkey, r.bal_cents, CAST(r.rk AS BIGINT) AS rk
FROM nation n JOIN ranked r ON r.c_nationkey = n.n_nationkey
WHERE r.rk <= 2
""",
    tier="T2",
)
def join_lateral_api(spark, sf_dir):
    """DataFrame.lateralJoin() (new API surface in Spark 4): the
    correlated-subquery join expressed directly on DataFrames — for each
    nation, the top-2 customers by account balance, with the correlation
    written as `col("n_nationkey").outer()` inside the right side's
    filter (the API twin of join_lateral_topn's SQL LATERAL). Catalyst
    decorrelates the per-row limit to a window top-k + equi join, which
    the oracle spells explicitly — the hash match proves the
    decorrelation.

    Determinism: ranking orders by (exact cents DESC, custkey) — total.
    Scale note: after decorrelation there is NO per-left-row re-execution:
    one c_nationkey window shuffle with a WindowGroupLimit top-k, then a
    broadcast join of the 25-nation dim.
    """
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("long").alias("bal_cents"),
    )
    from pyspark.sql.window import Window

    right = (
        c.where(F.col("c_nationkey") == F.col("n_nationkey").outer())
        .orderBy(F.col("bal_cents").desc(), "c_custkey")
        .limit(2)
    )
    w = Window.partitionBy("n_name").orderBy(F.col("bal_cents").desc(), "c_custkey")
    return (
        n.lateralJoin(right)
        .withColumn("rk", F.row_number().over(w))
        .select("n_name", "c_custkey", "bal_cents", F.col("rk").cast("long").alias("rk"))
    )


@register(
    "join_fuzzy_blocked",
    oracle="""
WITH p AS (
  SELECT p_partkey, p_name,
         substr(p_name, 1, 4) AS blk,
         length(p_name) // 4 AS lb
  FROM part
)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
FROM p a JOIN p b
  ON a.blk = b.blk AND a.lb = b.lb AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 4
""",
    tier="T2",
)
def join_fuzzy_blocked(spark, sf_dir):
    """Blocked fuzzy join (record linkage / entity resolution): candidate
    part-name pairs share a BLOCK — (4-char prefix, length÷4 bucket) —
    and survive if Levenshtein ≤ 4; the blocking key turns the O(n²)
    all-pairs edit-distance scan into an equi-join whose quadratic cost
    is confined within blocks, the standard ER architecture (block →
    verify) that every dedupe-by-name pipeline uses.

    Determinism: exact integer edit distances, unordered pairs emitted
    once (a < b). Scale notes: the self-join shuffles only the two 20k-row
    block-keyed sides; the in-block pair stream (21M candidates at sf0.1)
    is generated AFTER the exchange and pipelines straight into the verify
    — nothing quadratic ever crosses the wire. The key's real cost is its
    OUTPUT (every matching pair — 10.4M rows at sf0.1, ~20 s warm), which
    is the ER contract. Two "optimizations" were measured and REJECTED on
    this fixture (round 6): threshold-banded levenshtein (21.5 s — names
    are ~9-25 chars and 50% of candidates genuinely match, so the band
    never early-exits) and 8-way salting of the self-join (24.6 s — the
    hot block's pairs already pipeline within one stage; salting only
    added exchange width). They become the right tools when names are
    long and matches are sparse; the block-size monitor
    (etl_partition_skew's recipe) plus a longer prefix is the lever that
    matters at 100 TB.
    """
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        F.substring("p_name", 1, 4).alias("blk"),
        (F.length("p_name") / 4).cast("long").alias("lb"),
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        "blk",
        "lb",
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        "blk",
        "lb",
    )
    return (
        a.join(b, ["blk", "lb"])
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_dist") <= 4)
        .select("key_a", "key_b", "edit_dist")
    )


_ASOF_STRICT_SQL = """
WITH t AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase' AND value IS NOT NULL
),
ev AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'view'
),
a AS (
  SELECT ev.user_id, ev.event_id,
         t.value AS prev_purchase_value
  FROM ev ASOF LEFT JOIN t
    ON ev.user_id = t.user_id AND ev.ts > t.ts
)
SELECT user_id, event_id,
       CAST(FLOOR(prev_purchase_value * 100 + 0.5) AS BIGINT)
         AS prev_purchase_cents
FROM a
"""


@register("join_asof_strict", oracle=_ASOF_STRICT_SQL, tier="T2")
def join_asof_strict(spark, sf_dir):
    """STRICTLY-before as-of join (pandas allow_exact_matches=False): each
    view event picks the latest purchase strictly EARLIER than it — the
    no-lookahead variant required when both streams can log the same
    timestamp and the right side must not leak same-instant information
    (feature generation for models scores exactly this way). Completes
    the asof matrix: backward-inclusive (join_asof), forward, nearest,
    tolerance, and now strict.

    Implementation: the union-tag running-last trick with the EXCLUSION
    moved into the sort key — rows order by (ts, is_view DESC... i.e.
    views BEFORE purchases at equal ts), so the running last() over
    UNBOUNDED PRECEDING..CURRENT ROW can never see a same-ts purchase
    from a view row. The DuckDB oracle uses native `ASOF LEFT JOIN ON
    ev.ts > t.ts` — the hash match proves the frame trick implements
    strict semantics exactly, including equal-ts collisions.

    Determinism: ties within a ts resolve by the (ts, tag, event_id)
    total order identically in both engines; output is exact cents.
    NULL-valued purchases are excluded on BOTH sides (the
    join_point_in_time rule: last(ignoreNulls) would skip past a matched
    NULL row to an older purchase, where a native asof stops and yields
    NULL).
    Scale note: one user_id shuffle for the tagged union + window — the
    same single-pass shape as every asof key, no join fan-out.
    """
    from pyspark.sql.window import Window

    e = load(spark, sf_dir, "events")
    purchases = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .select("user_id", "ts", "event_id", "value", F.lit(1).alias("is_p"))
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("double").alias("value"), F.lit(0).alias("is_p"),
    )
    tagged = purchases.unionByName(views)
    # views sort BEFORE purchases at equal ts (is_p asc), so a view's
    # preceding frame cannot contain a same-ts purchase
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "pv", F.last(F.when(F.col("is_p") == 1, F.col("value")), True).over(w)
        )
        .filter(F.col("is_p") == 0)
        .select(
            "user_id",
            "event_id",
            F.floor(F.col("pv") * 100 + F.lit(0.5)).cast("long").alias(
                "prev_purchase_cents"
            ),
        )
    )


# Synthetic integer point cloud: micro-unit coordinates on a [0, 1e6)^2
# plane, derived per customer with the same arithmetic in both engines.
_GRID_R = 20_000  # radius AND grid cell size (cell = R => neighbors span 3x3)
_GX = "(c_custkey * 7919) % 1000000"
_GY = "(c_custkey * 104729) % 1000000"


@register(
    "join_grid_spatial",
    oracle=f"""
WITH pts AS (
  SELECT c_custkey AS k, {_GX} AS x, {_GY} AS y FROM customer
)
SELECT a.k AS k1, b.k AS k2,
       CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
         AS dist_sq
FROM pts a JOIN pts b ON a.k < b.k
WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      <= {_GRID_R} * {_GRID_R}
""",
    tier="T2",
)
def join_grid_spatial(spark, sf_dir):
    """Radius self-join over a point cloud via GRID-CELL BLOCKING — the
    spatial join every geo pipeline runs (points within R of each other):
    cell size = R, so any qualifying pair lives in the same or an
    adjacent cell; the left side fans out to its 3×3 cell neighborhood,
    an equi hash join on the cell id produces candidates, and the exact
    integer distance filter keeps true pairs. Each unordered pair is
    emitted exactly once (the right side keeps its home cell, the a.k <
    b.k guard canonicalizes) — no distinct pass needed. The ORACLE is the
    naive quadratic spelling, proving the grid join loses nothing at the
    cell boundaries (|dx| ≤ R ⟹ cell delta ≤ 1 is the invariant that
    makes 3×3 sufficient).

    Determinism: coordinates and distances are pure int64 (squares stay
    < 2·10¹²); the threshold compare never touches a float.

    Scale note: this is the O(n·density) replacement for the O(n²) join —
    9 candidate cells per point, then a cell-keyed shuffle; at 100 TB
    pick the cell size so the hottest cell's candidate block fits an
    executor (cell = R is optimal only when density is uniform; skewed
    clouds sub-split hot cells, the salted-join recipe).
    """
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("k"),
        F.expr(_GX).alias("x"),
        F.expr(_GY).alias("y"),
    ).withColumn("cx", F.expr(f"x DIV {_GRID_R}")).withColumn(
        "cy", F.expr(f"y DIV {_GRID_R}")
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probe = pts.select(
        "k", "x", "y", F.explode(offsets).alias("o"), "cx", "cy"
    ).select(
        F.col("k").alias("ka"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        (F.col("cx") + F.col("o.dx")).alias("ncx"),
        (F.col("cy") + F.col("o.dy")).alias("ncy"),
    )
    d2 = (F.col("xa") - F.col("x")) * (F.col("xa") - F.col("x")) + (
        F.col("ya") - F.col("y")
    ) * (F.col("ya") - F.col("y"))
    return (
        probe.join(
            pts,
            (F.col("ncx") == F.col("cx"))
            & (F.col("ncy") == F.col("cy"))
            & (F.col("ka") < F.col("k")),
        )
        .filter(d2 <= F.lit(_GRID_R * _GRID_R))
        .select(
            F.col("ka").alias("k1"),
            F.col("k").alias("k2"),
            d2.cast("long").alias("dist_sq"),
        )
    )


# ------------------------------------------------------- bloom join prefilter
# The runtime-filter pattern a 100 TB fact join lives on: build a Bloom
# filter over the SMALL side's join keys, pack it into a flat word-indexed
# bitmask array, inline it as a literal, and drop fact rows MAP-SIDE before
# any shuffle. Word layout: m = 131072 bits per seed as 2048 int64 words;
# flat index seed*2048 + (pos >> 6). The payload is <= k * 2048 words
# REGARDLESS of member count — O(m), not O(members).
_BJ_K, _BJ_M = 3, 131_072
_BJ_W = _BJ_M // 64  # words per seed
_BJ_PRED_SPARK = "(o_orderpriority = '1-URGENT') AND (o_orderdate >= TIMESTAMP '2000-01-01')"


# Integer Fibonacci-style mixer: ((key % P) * 2654435761) % P stays inside
# int64 ((P-1)·2654435761 ≈ 2.7e18 < 2^63) and inside whole-stage codegen —
# the string poly-hash lambda costs ~4 s per 600k fact rows interpreted,
# which at 100 TB would dominate the very scan the prefilter is meant to
# cheapen. The bloom needs only dispersion, not oracle-portability (the
# oracle is the plain join), but the mix IS engine-portable integer math
# anyway, which the property suite exercises on both engines.
_BJ_MIX = 2654435761


def _bj_hash(key_col: str) -> str:
    from ..conform import POLY_P

    return f"((({key_col} % {POLY_P}) * {_BJ_MIX}) % {POLY_P})"


def _bj_slot_mask(hash_col: str):
    """The k (slot, bitmask) expression pairs over a precomputed hash
    column — arithmetic only, evaluated inside codegen."""
    from ..conform import POLY_P

    out = []
    for i in range(_BJ_K):
        pos = f"((({2 * i + 1} * {hash_col} + {97 * i + 13}) % {POLY_P}) % {_BJ_M})"
        slot = f"CAST({i * _BJ_W} + ({pos} DIV 64) AS BIGINT)"
        mask = f"shiftleft(CAST(1 AS BIGINT), CAST({pos} % 64 AS INT))"
        out.append((F.expr(slot), F.expr(mask)))
    return out


@register(
    "join_bloom_prefilter",
    oracle=f"""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
       {sql_money_sum('l_extendedprice')} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT' AND o_orderdate >= TIMESTAMP '2000-01-01'
GROUP BY l_returnflag
""",
    tier="T2",
)
def join_bloom_prefilter(spark, sf_dir):
    """Semi-join reduction via a broadcast Bloom filter: revenue per return
    flag for lineitems of recent urgent orders, with the fact side
    pre-filtered by a Bloom filter over the qualifying order keys BEFORE
    the exact join.

    The result is EXACT — Bloom filters have no false negatives, so no
    qualifying lineitem is dropped, and the exact join afterwards removes
    the false positives — which is why the oracle is the plain SQL join.
    What the Bloom adds is the plan: the word array is materialized once
    from the small side and inlined as a LITERAL, so the probe is a pure
    integer hash + bitmask filter inside the fact scan's codegen stage —
    at 100 TB only the ~3 % candidate slice of lineitem reaches the join
    shuffle instead of all of it. This mirrors how Spark's own runtime
    row-level filtering injects its bloom (a materialized subquery result
    reused as a constant); the explicit form is deterministic and
    engine-portable, and composes with [[sketch_bloom_filter]], which
    proves the family's FP/FN behavior.

    The build-side collect is a BOUNDED CONSTANT: ≤ k·2048 = 6144 int64
    words by construction, REGARDLESS of member count — the driver ships
    ~48 KB however large the corpus is. (A crossJoin(broadcast(1-row))
    variant was measured 6× slower at sf0.1: the nested-loop join's
    interpreted condition evaluation cost ~5 µs per fact row, versus
    codegen'd literal-array indexing here.)

    Sizing: m = 131072 bits x k = 3 holds FP under ~1 % to ~10k members;
    production sizing scales m with the member count while the payload
    stays <= k*2048 words by construction.
    """
    o = load(spark, sf_dir, "orders")
    members = o.filter(F.expr(_BJ_PRED_SPARK)).select("o_orderkey")
    pairs = _bj_slot_mask("_bh")
    bits = (
        members.select(F.expr(_bj_hash("o_orderkey")).alias("_bh"))
        .select(
            F.explode(
                F.array(
                    *[
                        F.struct(s.alias("slot"), m.alias("mask"))
                        for s, m in pairs
                    ]
                )
            ).alias("b")
        )
        .select(F.col("b.slot").alias("slot"), F.col("b.mask").alias("mask"))
    )
    words = dict(
        bits.groupBy("slot").agg(F.expr("bit_or(mask)").alias("word")).collect()
    )
    dense = [words.get(i, 0) for i in range(_BJ_K * _BJ_W)]

    li = load(spark, sf_dir, "lineitem")
    # one SQL literal, not F.lit(list): 6144 py4j element round-trips cost
    # ~3 s of driver time per plan construction; the parsed string is ~4 ms
    arr = F.expr("array(" + ",".join(f"{w}L" for w in dense) + ")")
    hit = None
    for s, m in _bj_slot_mask("_bh"):
        c = F.element_at(arr, (s + 1).cast("int")).bitwiseAND(m) != 0
        hit = c if hit is None else (hit & c)
    candidates = (
        li.select(
            "l_orderkey",
            "l_returnflag",
            "l_extendedprice",
            F.expr(_bj_hash("l_orderkey")).alias("_bh"),
        )
        .filter(hit)
        .drop("_bh")
    )
    return (
        candidates.join(
            F.broadcast(members), candidates.l_orderkey == members.o_orderkey
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.countDistinct("l_orderkey").cast("long").alias("n_orders"),
            money_sum(F.col("l_extendedprice")).alias("revenue"),
        )
    )
