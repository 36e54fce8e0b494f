"""Reshaping operators: pivot / unpivot, plus SQL-subquery surfaces
(correlated scalar, uncorrelated IN) that exercise Catalyst decorrelation,
a synthetic range source, and the sessionize library op as a declared key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_money_sum, sql_rnd
from ..io import load
from ..ops.relational import sessionize
from ..registry import register

_ETYPES = ["view", "click", "purchase", "signup", "error"]


@register(
    "reshape_pivot",
    oracle=f"""
SELECT user_id % 50 AS bucket,
       {", ".join(f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}" for t in _ETYPES)}
FROM events
GROUP BY user_id % 50
""",
    tier="T2",
)
def reshape_pivot(spark, sf_dir):
    """Pivot event_type into count columns per user bucket (fixed value list
    so the schema is static — the scalable form of pivot)."""
    e = load(spark, sf_dir, "events")
    p = (
        e.groupBy((F.col("user_id") % 50).alias("bucket"))
        .pivot("event_type", _ETYPES)
        .count()
    )
    # pivot leaves NULL for empty cells; normalize to 0 and stable names
    return p.select(
        "bucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _ETYPES],
    )


@register(
    "reshape_unpivot",
    oracle="""
SELECT c_custkey, metric, val FROM (
  SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
  UNION ALL
  SELECT c_custkey, 'nationkey' AS metric, CAST(c_nationkey AS DOUBLE) AS val FROM customer
)
""",
    tier="T2",
)
def reshape_unpivot(spark, sf_dir):
    """Unpivot (melt) two customer measures into (key, metric, value) rows."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.col("c_acctbal").alias("acctbal"),
        F.col("c_nationkey").cast("double").alias("nationkey"),
    ).unpivot("c_custkey", ["acctbal", "nationkey"], "metric", "val")


@register(
    "sub_scalar_correlated",
    oracle=f"""
SELECT o_orderkey,
       {sql_rnd("o_totalprice / (SELECT " + sql_money_sum('o2.o_totalprice') + " FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)", 4)} AS share_of_customer
FROM orders o1
""",
    tier="T2",
)
def sub_scalar_correlated(spark, sf_dir):
    """Correlated scalar subquery (each order's share of its customer's
    lifetime spend) — Catalyst decorrelates it into an aggregate + join
    (SURVEY.md §4.2); DuckDB runs the identical SQL."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("sub_orders")
    share = (
        "FLOOR((o_totalprice / "
        "(SELECT CAST(SUM(CAST(FLOOR(o2.o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100 "
        "FROM sub_orders o2 WHERE o2.o_custkey = o1.o_custkey)) * 10000 + 0.5) / 10000"
    )
    return spark.sql(
        f"SELECT o_orderkey, {share} AS share_of_customer FROM sub_orders o1"
    )


@register(
    "sub_in_uncorrelated",
    oracle="""
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
""",
    tier="T2",
)
def sub_in_uncorrelated(spark, sf_dir):
    """Uncorrelated IN subquery (SQL surface; Catalyst plans a semi join)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("sub_in_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("sub_in_customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM sub_in_orders
        WHERE o_custkey IN (SELECT c_custkey FROM sub_in_customer
                            WHERE c_acctbal > 9000)
        """
    )


@register(
    "source_range",
    oracle="""
SELECT i, i * i AS sq, i % 7 AS md
FROM generate_series(0, 999) AS t(i)
""",
    tier="T2",
)
def source_range(spark, sf_dir):
    """Synthetic range source (spark.range ↔ generate_series) with computed
    columns — the zero-IO source for generators and backfills."""
    return spark.range(0, 1000).select(
        F.col("id").alias("i"),
        (F.col("id") * F.col("id")).alias("sq"),
        (F.col("id") % 7).alias("md"),
    )


@register(
    "win_sessionize",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_s
  FROM events
)
""",
    tier="T2",
)
def win_sessionize(spark, sf_dir):
    """Per-event session ids from the ops.relational.sessionize library op
    (drives the E2 surface through the oracle gate; semantics match native
    session_window: boundary-touching windows coalesce, new session
    strictly after the gap)."""
    e = load(spark, sf_dir, "events")
    return sessionize(e, "user_id", "ts", 30).select(
        "event_id", "user_id", F.col("session_id").cast("long")
    )


@register(
    "dedup_exact_groups",
    oracle="""
SELECT md5(text) AS content_hash,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       MIN(doc_id) AS survivor,
       array_to_string(list_sort(list(doc_id)), '|') AS members
FROM documents
GROUP BY md5(text)
""",
    tier="T2",
)
def dedup_exact_groups(spark, sf_dir):
    """Exact-dup group report: per content hash, group size, survivor and
    sorted member list (the audit-trail companion to dedup_exact). Members
    are '|'-joined strings — no ArrayType in declared outputs (driver's
    pandas canonicalizer cannot hash list cells)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("survivor"),
        F.array_join(F.sort_array(F.collect_list("doc_id")), "|").alias("members"),
    )


@register(
    "text_cooccurrence_pmi",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS token
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tok GROUP BY token),
pairs AS (
  SELECT a.token AS t1, b.token AS t2, CAST(COUNT(*) AS BIGINT) AS co
  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.token < b.token
  GROUP BY 1, 2
  HAVING COUNT(*) >= 50
)
SELECT t1, t2, co,
       {sql_rnd("ln((CAST(co AS DOUBLE) * n_docs) / (CAST(x.df AS DOUBLE) * y.df))", 4)} AS pmi
FROM pairs JOIN df x ON t1 = x.token JOIN df y ON t2 = y.token CROSS JOIN n
""",
    tier="T2",
)
def text_cooccurrence_pmi(spark, sf_dir):
    """Document-level token co-occurrence with pointwise mutual information
    (corpus-analysis staple). Distinct tokens per doc, pair counts with a
    min-support cut, PMI = ln(P(a,b) / (P(a)P(b))).

    Scale note: min-support (HAVING co >= 50) bounds the pair explosion;
    at 100 TB the same cut is applied per shard before the global combine.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    df_ = tok.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    pairs = (
        tok.alias("a")
        .join(
            tok.alias("b"),
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.token") < F.col("b.token")),
        )
        .groupBy(F.col("a.token").alias("t1"), F.col("b.token").alias("t2"))
        .agg(F.count(F.lit(1)).alias("co"))
        .filter(F.col("co") >= 50)
    )
    pmi = F.log(
        (F.col("co").cast("double") * F.col("n_docs"))
        / (F.col("df").cast("double") * F.col("df2"))
    )
    return (
        pairs.join(F.broadcast(df_.select(F.col("token").alias("t1"), "df")), "t1")
        .join(
            F.broadcast(
                df_.select(F.col("token").alias("t2"), F.col("df").alias("df2"))
            ),
            "t2",
        )
        .crossJoin(F.broadcast(n))
        .select("t1", "t2", "co", rnd(pmi, 4).alias("pmi"))
    )


_RECURSIVE_SQL = """
WITH RECURSIVE chain(s_suppkey, root, depth) AS (
  SELECT s_suppkey, s_suppkey AS root, 0 AS depth
  FROM supplier WHERE s_suppkey <= 1
  UNION ALL
  SELECT s.s_suppkey, c.root, c.depth + 1
  FROM supplier s JOIN chain c ON s.s_suppkey // 2 = c.s_suppkey
  WHERE s.s_suppkey > 1
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(s_suppkey) AS BIGINT) AS key_sum,
       CAST(SUM(root) AS BIGINT) AS root_sum
FROM chain GROUP BY depth
"""


@register("sub_recursive_cte", oracle=_RECURSIVE_SQL, tier="T2")
def sub_recursive_cte(spark, sf_dir):
    """Recursive CTE (WITH RECURSIVE, new SQL surface in Spark 4) walking a
    deterministic org hierarchy derived from fixture keys: supplier s
    reports to s DIV 2 (a binary tree rooted at suppkeys {0, 1}), and the
    recursion propagates each node's root and depth — the canonical
    management-chain / bill-of-materials workload that plain windows
    cannot express. Output aggregates per depth (count, key/root sums),
    all integer-exact.

    Scale notes: recursion executes as one join per level, so total cost =
    tree DEPTH (log₂|suppliers| here — 10 levels at sf0.1, ~24 at 100 TB)
    full scans of a table that an actual deployment would have partitioned
    on the manager key; frontier rows shrink nothing here (every level is
    half the table) but the join is always manager-key equi-hash, never a
    cartesian. For deep-chain folds (depth ~ rows) prefer the
    collect_list + aggregate() array-fold pattern (ts_holt_linear).
    """
    load(spark, sf_dir, "supplier").createOrReplaceTempView("sub_rec_supplier")
    return spark.sql(_RECURSIVE_SQL.replace("supplier", "sub_rec_supplier").replace("//", "DIV"))


@register(
    "sql_pipe_syntax",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
FROM orders
WHERE o_totalprice > 1000
GROUP BY o_orderstatus
""",
    tier="T2",
)
def sql_pipe_syntax(spark, sf_dir):
    """SQL pipe syntax (|>, new surface in Spark 4): the same
    filter→aggregate expressed as a linear pipeline instead of nested
    clauses. DuckDB's oracle is the equivalent ANSI spelling — results must
    hash-match, proving the pipe operators are pure sugar over the same
    plan (Catalyst compiles both to an identical aggregate).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("pipe_orders")
    return spark.sql(
        """
        FROM pipe_orders
        |> WHERE o_totalprice > 1000
        |> AGGREGATE COUNT(*) AS n,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
           GROUP BY o_orderstatus
        |> SELECT o_orderstatus, n, cents
        """
    )


@register(
    "sql_parameterized",
    oracle="""
SELECT o_orderstatus,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents
FROM orders
WHERE o_totalprice > 1000 AND o_orderpriority = '1-URGENT'
GROUP BY o_orderstatus
""",
    tier="T2",
)
def sql_parameterized(spark, sf_dir):
    """Parameterized SQL (Spark 4 API surface): named `:param` markers bound
    via the args dict — injection-safe literals, the way a swallow-style
    service templates user-supplied thresholds — plus `{df}` DataFrame
    substitution so the query runs against an in-scope DataFrame without a
    temp-view registration. The oracle inlines the same constants.
    """
    o = load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n,
               MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS max_cents
        FROM {orders}
        WHERE o_totalprice > :lo AND o_orderpriority = :prio
        GROUP BY o_orderstatus
        """,
        args={"lo": 1000.0, "prio": "1-URGENT"},
        orders=o,
    )


@register(
    "sql_execute_immediate",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_totalprice > 150000.0
GROUP BY o_orderpriority
""",
    tier="T2",
)
def sql_execute_immediate(spark, sf_dir):
    """Dynamic SQL (Spark 4 surface): a session variable set with SET VAR is
    passed through EXECUTE IMMEDIATE ... USING into a `?` placeholder — the
    templated-report shape (query text assembled at runtime, values bound as
    parameters, never string-spliced). The oracle inlines the same constant.

    Scale note: EXECUTE IMMEDIATE is pure front-end — the inner query
    compiles to the identical Catalyst plan as the static spelling
    (partial agg + exchange on o_orderpriority), so there is no runtime
    cost to the indirection.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_exec_imm")
    spark.sql("DECLARE OR REPLACE VARIABLE exec_imm_lo DOUBLE DEFAULT 0.0")
    spark.sql("SET VAR exec_imm_lo = 150000.0")
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT o_orderpriority,
                  COUNT(*) AS n,
                  SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
           FROM orders_exec_imm
           WHERE o_totalprice > ?
           GROUP BY o_orderpriority'
          USING exec_imm_lo
        """
    )


@register(
    "sql_scalar_udf",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)
                           * 100 + 0.5) AS BIGINT)) AS BIGINT) AS charged_cents
FROM lineitem
GROUP BY l_returnflag
""",
    tier="T2",
)
def sql_scalar_udf(spark, sf_dir):
    """SQL-declared scalar UDF (Spark 4 CREATE FUNCTION ... RETURN expr):
    the charge formula lives as a named catalog function instead of a
    Python UDF — Catalyst inlines the body, so the call costs nothing and
    stays inside whole-stage codegen (the right way to share business
    logic across queries; contrast udf_python_scalar, the slow path).
    The oracle inlines the same expression.

    Determinism: the UDF body is pure double IEEE arithmetic identical in
    both engines, floored to integer cents per row before the SUM.
    """
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("lineitem_sqludf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charge_cents(
            p DOUBLE, d DOUBLE, t DOUBLE)
        RETURNS BIGINT
        RETURN CAST(FLOOR(p * (1.0 - d) * (1.0 + t) * 100 + 0.5) AS BIGINT)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               COUNT(*) AS n,
               SUM(charge_cents(l_extendedprice, l_discount, l_tax))
                 AS charged_cents
        FROM lineitem_sqludf
        GROUP BY l_returnflag
        """
    )


@register(
    "sql_pivot_syntax",
    oracle="""
SELECT o_orderpriority,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS f_cents,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS o_cents,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS p_cents
FROM orders GROUP BY o_orderpriority
""",
    tier="T2",
)
def sql_pivot_syntax(spark, sf_dir):
    """SQL PIVOT clause (the declarative twin of reshape_pivot's DataFrame
    groupBy().pivot()): order revenue by priority, statuses fanned into
    columns with an explicit IN list — the explicit list is what makes
    PIVOT scale-safe (no distinct-value discovery job) and schema-stable.
    The oracle spells the same table as FILTER aggregates.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_pivot")
    return spark.sql(
        """
        SELECT * FROM (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders_pivot
        )
        PIVOT (SUM(cents) FOR o_orderstatus IN ('F' AS f_cents,
                                                'O' AS o_cents,
                                                'P' AS p_cents))
        """
    )


@register(
    "sql_group_by_all",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY ALL
""",
    tier="T2",
)
def sql_group_by_all(spark, sf_dir):
    """GROUP BY ALL / ORDER BY ALL (Spark 4 SQL surface): every
    non-aggregate select item becomes a grouping key implicitly — the
    ad-hoc-exploration spelling that removes the copy-the-select-list
    failure mode. DuckDB supports the identical syntax, so the oracle IS
    the same text: the hash match proves both engines resolve ALL to the
    same key set ((status, priority) here).

    Scale note: resolves at analysis time to an ordinary partial+final
    hash aggregate keyed (o_orderstatus, o_orderpriority) — no runtime
    cost over the explicit spelling.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gball")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM orders_gball
        GROUP BY ALL
        """
    )


@register(
    "sql_window_clause",
    oracle="""
WITH w AS (
  SELECT o_orderstatus, o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
r AS (
  SELECT o_orderstatus, o_orderkey, cents,
         rank() OVER win AS rk,
         CAST(SUM(cents) OVER win AS BIGINT) AS run_cents
  FROM w
  WINDOW win AS (PARTITION BY o_orderstatus
                 ORDER BY cents DESC, o_orderkey)
)
SELECT o_orderstatus, o_orderkey, cents, CAST(rk AS BIGINT) AS rk, run_cents
FROM r WHERE rk <= 5
""",
    tier="T2",
)
def sql_window_clause(spark, sf_dir):
    """Named WINDOW clause (shared window spec): rank and a running
    integer-cent sum both bind the same `WINDOW win AS (...)` definition —
    the one-definition-two-functions surface that keeps sibling window
    functions provably over the same frame. DuckDB supports the identical
    clause; the oracle mirrors it verbatim.

    Determinism: the spec orders by (cents DESC, o_orderkey) — a total
    order, so rank and the running sum are unique. Scale note: both
    functions share ONE Window physical node (single partition-by-status
    shuffle + sort serves both), which .explain confirms; Spark further
    pushes rk<=5 into the sort as WindowGroupLimit.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_winclause")
    return spark.sql(
        """
        WITH w AS (
          SELECT o_orderstatus, o_orderkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM orders_winclause
        ),
        r AS (
          SELECT o_orderstatus, o_orderkey, cents,
                 rank() OVER win AS rk,
                 SUM(cents) OVER win AS run_cents
          FROM w
          WINDOW win AS (PARTITION BY o_orderstatus
                         ORDER BY cents DESC, o_orderkey)
        )
        SELECT o_orderstatus, o_orderkey, cents, CAST(rk AS BIGINT) AS rk,
               run_cents
        FROM r WHERE rk <= 5
        """
    )


@register(
    "sql_identifier_clause",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS min_cents
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
""",
    tier="T2",
)
def sql_identifier_clause(spark, sf_dir):
    """IDENTIFIER() clause (Spark 4 surface): the table name arrives as a
    bound :param and is resolved through IDENTIFIER(:tbl) — dynamic object
    selection (per-tenant table routing, env-prefixed catalogs) without
    string-splicing SQL, the injection-safe half of what
    sql_execute_immediate does for values. The oracle inlines the resolved
    table.

    Scale note: IDENTIFIER resolves during analysis; the plan is the
    ordinary pushed-filter scan + partial/final aggregate, identical to a
    static FROM.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_ident_t1")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                 AS min_cents
        FROM IDENTIFIER(:tbl)
        WHERE o_orderstatus = :st
        GROUP BY o_orderpriority
        """,
        args={"tbl": "orders_ident_t1", "st": "O"},
    )


@register(
    "sql_unpivot_syntax",
    oracle="""
WITH base AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_cents
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS val FROM base
UNION ALL
SELECT o_orderpriority, 'cents', cents FROM base
UNION ALL
SELECT o_orderpriority, 'max_cents', max_cents FROM base
""",
    tier="T2",
)
def sql_unpivot_syntax(spark, sf_dir):
    """SQL UNPIVOT clause (the declarative twin of reshape_unpivot's
    DataFrame unpivot/melt): a per-priority metrics table is folded from
    wide (three BIGINT metric columns) to long (metric, val) rows — the
    export shape for metric stores. The oracle spells the same fold as the
    classic UNION ALL, so the hash match proves the clause is pure sugar.

    Scale note: UNPIVOT is a map-side generate (3 output rows per input
    row, no shuffle beyond the feeding aggregate); the UNION ALL spelling
    would scan the aggregate three times without a CTE — the clause form
    never does.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_unpivot")
    return spark.sql(
        """
        SELECT o_orderpriority, metric, val FROM (
          SELECT o_orderpriority,
                 COUNT(*) AS n_orders,
                 SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents,
                 MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                   AS max_cents
          FROM orders_unpivot GROUP BY o_orderpriority
        )
        UNPIVOT (val FOR metric IN (n_orders, cents, max_cents))
        """
    )


@register(
    "sql_star_except",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY o_orderstatus, o_orderpriority
""",
    tier="T2",
)
def sql_star_except(spark, sf_dir):
    """SELECT * EXCEPT (...) (Spark 4 SQL surface): project every column of
    a wide aggregate except the ones being dropped — the schema-stable way
    to strip internal/debug columns before publishing a table (listing the
    kept columns would silently pin an old schema). The oracle lists the
    surviving columns explicitly, proving EXCEPT resolves to exactly that
    set.

    Scale note: star-except resolves at analysis time to an ordinary
    projection, so column pruning still reaches the scan — the dropped
    column here never leaves the aggregate.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_star_except")
    return spark.sql(
        """
        SELECT * EXCEPT (debug_rank) FROM (
          SELECT o_orderstatus, o_orderpriority,
                 COUNT(*) AS n,
                 SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents,
                 MAX(o_orderkey) AS debug_rank
          FROM orders_star_except
          GROUP BY o_orderstatus, o_orderpriority
        )
        """
    )


@register(
    "sql_order_by_all",
    oracle="""
WITH base AS (
  SELECT o_orderstatus, o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders WHERE o_orderpriority IS NOT NULL
  GROUP BY o_orderstatus, o_orderpriority
)
SELECT * FROM base
ORDER BY o_orderstatus, o_orderpriority, n
LIMIT 7
""",
    tier="T2",
)
def sql_order_by_all(spark, sf_dir):
    """ORDER BY ALL (Spark 4 SQL surface): sort by every select item
    left-to-right without restating the list — paired with LIMIT so the
    ordering is observable in the result (the kept 7 rows differ if ALL
    resolved differently). DuckDB's oracle spells the resolved column list
    explicitly; the hash match proves the same total order.

    Determinism: (status, priority) is a candidate key of the aggregate,
    so the ALL-order is total and the LIMIT cut is unique. Scale note:
    resolves to an ordinary TakeOrderedAndProject — a top-k heap per
    partition + driver merge, never a global sort.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_oball")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_oball
        WHERE o_orderpriority IS NOT NULL
        GROUP BY o_orderstatus, o_orderpriority
        ORDER BY ALL
        LIMIT 7
        """
    )


@register(
    "sql_values_inline",
    oracle="""
WITH tier(prio, tier_name, weight) AS (
  VALUES ('1-URGENT',  'hot',  3),
         ('2-HIGH',    'hot',  2),
         ('3-MEDIUM',  'warm', 1),
         ('4-NOT SPECIFIED', 'cold', 0),
         ('5-LOW',     'cold', 0)
)
SELECT t.tier_name,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(t.weight AS BIGINT)
                * CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS weighted_cents
FROM orders o JOIN tier t ON o.o_orderpriority = t.prio
GROUP BY t.tier_name
""",
    tier="T2",
)
def sql_values_inline(spark, sf_dir):
    """Inline VALUES table constructor: a literal lookup table (priority →
    tier, weight) declared in the query text and joined against the fact
    table — the no-ETL way to ship a small mapping with the query itself
    (feature flags, tier weights, enum renames). Both engines support the
    identical clause.

    Scale note: a VALUES relation is a LocalRelation — Catalyst broadcasts
    it (5 rows), so the join is a map-side broadcast-hash join; the
    aggregate shuffles only the 3 tier groups.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_values_inline")
    return spark.sql(
        """
        SELECT t.tier_name,
               COUNT(*) AS n,
               SUM(CAST(t.weight AS BIGINT)
                   * CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                 AS weighted_cents
        FROM orders_values_inline o
        JOIN VALUES ('1-URGENT',  'hot',  3),
                    ('2-HIGH',    'hot',  2),
                    ('3-MEDIUM',  'warm', 1),
                    ('4-NOT SPECIFIED', 'cold', 0),
                    ('5-LOW',     'cold', 0) AS t(prio, tier_name, weight)
          ON o.o_orderpriority = t.prio
        GROUP BY t.tier_name
        """
    )


@register(
    "sql_transform_script",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
GROUP BY o_orderpriority
""",
    tier="T2",
)
def sql_transform_script(spark, sf_dir):
    """Hive-style script transform (SELECT TRANSFORM ... USING 'cat'): rows
    cross a pipe into an external process and come back as tab-separated
    strings — the legacy streaming-script integration surface (awk/sed/
    custom binaries in ETL). `cat` is the identity script, so casting the
    round-tripped strings back must reproduce the original aggregate
    exactly; the oracle computes it directly.

    Scale note: every TRANSFORM row forks through a pipe with string
    serialization both ways — orders of magnitude slower than codegen, so
    the script runs on the 5-row PRE-AGGREGATED table, never the fact
    stream. That aggregate-first shape is the only defensible use of
    script transforms at 100 TB.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_transform_script")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(n AS BIGINT) AS n,
               CAST(cents AS BIGINT) AS cents
        FROM (
          SELECT TRANSFORM (o_orderpriority, n, cents)
            USING 'cat' AS (o_orderpriority STRING, n STRING, cents STRING)
          FROM (
            SELECT o_orderpriority,
                   COUNT(*) AS n,
                   SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS cents
            FROM orders_transform_script
            GROUP BY o_orderpriority
          )
        )
        """
    )


@register(
    "reshape_transpose",
    oracle="""
WITH base AS (
  SELECT o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_cents
  FROM orders GROUP BY o_orderpriority
)
SELECT 'n' AS key,
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN n END) AS "1-URGENT",
       MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN n END) AS "2-HIGH",
       MAX(CASE WHEN o_orderpriority = '3-MEDIUM' THEN n END) AS "3-MEDIUM",
       MAX(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN n END)
         AS "4-NOT SPECIFIED",
       MAX(CASE WHEN o_orderpriority = '5-LOW' THEN n END) AS "5-LOW"
FROM base
UNION ALL
SELECT 'cents',
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN cents END),
       MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN cents END),
       MAX(CASE WHEN o_orderpriority = '3-MEDIUM' THEN cents END),
       MAX(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN cents END),
       MAX(CASE WHEN o_orderpriority = '5-LOW' THEN cents END)
FROM base
UNION ALL
SELECT 'max_cents',
       MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN max_cents END),
       MAX(CASE WHEN o_orderpriority = '2-HIGH' THEN max_cents END),
       MAX(CASE WHEN o_orderpriority = '3-MEDIUM' THEN max_cents END),
       MAX(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN max_cents END),
       MAX(CASE WHEN o_orderpriority = '5-LOW' THEN max_cents END)
FROM base
""",
    tier="T2",
)
def reshape_transpose(spark, sf_dir):
    """DataFrame.transpose() (new API surface in Spark 4): flip a
    per-priority metrics table so metrics become rows and priorities
    become columns — the report/export orientation (one row per KPI). The
    first column supplies the new column names; the oracle hand-spells
    the transposed table with FILTER-style CASE aggregates, so the hash
    match proves transpose's row→column mapping exactly.

    Determinism: all transposed cells are exact BIGINT aggregates sharing
    one type (transpose requires a common cell type); the metric-name
    `key` column makes row identity explicit, and column names are pinned
    by the priority domain. Scale note: transpose COLLECTS the index
    column to name the output schema, so it is strictly a
    small-aggregate-table verb (5×4 here) — never point it at a fact
    table; the feeding aggregate is the ordinary partial+final pass.
    """
    o = load(spark, sf_dir, "orders")
    base = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("cents"),
            F.max(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long"))
            .cast("long")
            .alias("max_cents"),
        )
        .orderBy("o_orderpriority")
    )
    return base.transpose()


@register(
    "sql_grouping_id",
    oracle="""
SELECT COALESCE(o_orderstatus, '<all>') AS status,
       COALESCE(o_orderpriority, '<all>') AS priority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
       CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), (o_orderpriority), ())
""",
    tier="T2",
)
def sql_grouping_id(spark, sf_dir):
    """GROUPING() / GROUPING_ID() over GROUPING SETS: the disambiguation
    functions that tell a real NULL apart from a rollup-total NULL — the
    thing every BI export on top of agg_rollup/agg_grouping_sets needs
    (COALESCE to '<all>' only works because GROUPING says which rows are
    totals). GROUPING_ID packs the per-column grouping bits into one
    integer (status bit 2, priority bit 1), pinning Spark's and DuckDB's
    bit order against each other.

    Determinism: all outputs are exact integers/pinned labels. Scale
    note: grouping sets expand rows map-side (one per matching set) then
    partial-aggregate — same plan family as agg_grouping_sets; the
    grouping-bit columns are free metadata, no extra pass.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_gid")
    return spark.sql(
        """
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(GROUPING_ID(o_orderstatus, o_orderpriority) AS BIGINT)
                 AS gid,
               COUNT(*) AS n
        FROM orders_gid
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "sub_not_in_nulls",
    oracle="""
WITH probe AS (
  SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
  FROM customer WHERE c_mktsegment = 'BUILDING'
)
SELECT
  CAST((SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM probe)) AS BIGINT)
    AS not_in_with_nulls,
  CAST((SELECT COUNT(*) FROM orders
        WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
       AS BIGINT) AS not_in_null_free,
  CAST((SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.k = o.o_custkey))
       AS BIGINT) AS not_exists,
  CAST((SELECT COUNT(*) FROM probe WHERE k IS NULL) AS BIGINT) AS n_nulls
""",
    tier="T2",
)
def sub_not_in_nulls(spark, sf_dir):
    """NOT IN vs NOT EXISTS under NULLs — the classic three-valued-logic
    trap, pinned cross-engine: when the NOT IN list contains even one
    NULL, every comparison is UNKNOWN and the predicate filters EVERY row
    (not_in_with_nulls = 0 whenever n_nulls > 0), while NOT EXISTS and
    the null-free NOT IN agree on the real anti-join count. Shipping this
    as a declared key freezes the semantics an engine swap silently
    breaks (several warehouses "fix" NOT IN and diverge from the
    standard).

    Determinism: four exact counts. Scale note: Catalyst plans NOT IN as
    a null-aware anti join (broadcast when the probe side is small) and
    NOT EXISTS as a plain left-anti hash join — same single fact-scan
    budget per count; the four scalar counts broadcast-join into one row
    (audited scalar pattern).
    """
    load(spark, sf_dir, "orders").createOrReplaceTempView("nin_orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("nin_customer")
    return spark.sql(
        """
        WITH probe AS (
          SELECT CASE WHEN c_acctbal < 0 THEN NULL ELSE c_custkey END AS k
          FROM nin_customer WHERE c_mktsegment = 'BUILDING'
        )
        SELECT
          (SELECT COUNT(*) FROM nin_orders
           WHERE o_custkey NOT IN (SELECT k FROM probe))
            AS not_in_with_nulls,
          (SELECT COUNT(*) FROM nin_orders
           WHERE o_custkey NOT IN (SELECT k FROM probe WHERE k IS NOT NULL))
            AS not_in_null_free,
          (SELECT COUNT(*) FROM nin_orders o
           WHERE NOT EXISTS (SELECT 1 FROM probe p
                             WHERE p.k = o.o_custkey)) AS not_exists,
          (SELECT COUNT(*) FROM probe WHERE k IS NULL) AS n_nulls
        """
    )


@register(
    "sql_join_hints",
    oracle="""
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
""",
    tier="T2",
)
def sql_join_hints(spark, sf_dir):
    """SQL join-strategy hints (/*+ BROADCAST(dim), REPARTITION(n) */) —
    the escape hatch when statistics mislead the optimizer at 100 TB
    (a "small" dim that stats undercount, or a skewed shuffle that needs
    explicit width). Hints change ONLY the physical strategy, never the
    result: the oracle runs the unhinted join and the hash must match.
    The plan test pins that the BROADCAST hint actually took effect.

    Scale note: BROADCAST ships the 25-row dim to every task (no shuffle
    of the customer side for the join); the REPARTITION(8) hint fixes the
    pre-aggregate width — both are the knobs you reach for before
    touching spark.sql.autoBroadcastJoinThreshold globally.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("hints_customer")
    load(spark, sf_dir, "nation").createOrReplaceTempView("hints_nation")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(n), REPARTITION(8) */
               n.n_name,
               COUNT(*) AS n_customers,
               SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_cents
        FROM hints_customer c JOIN hints_nation n
          ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "sql_lateral_view",
    oracle="""
SELECT t.doc_id, g.tok AS token, CAST(length(g.tok) AS BIGINT) AS tok_len
FROM (SELECT doc_id, string_split(text, ' ') AS arr
      FROM documents WHERE doc_id < 50) t,
     LATERAL (SELECT unnest(t.arr) AS tok) g
""",
    tier="T2",
)
def sql_lateral_view(spark, sf_dir):
    """LATERAL VIEW explode(...) — the Hive-compatible generator syntax
    (the spelling a decade of migrated warehouse SQL uses, distinct from
    both the DataFrame explode and UDTF lateral joins). Tokens of the
    first 50 docs with lengths; DuckDB's oracle is its unnest LATERAL.

    Determinism: pure string/integer outputs; generator order is
    per-row positional in both engines (and the hash compare is
    order-free anyway). Scale note: LATERAL VIEW compiles to the same
    Generate node as explode() — map-side fan-out, no shuffle; the
    doc_id < 50 pushdown reaches the parquet scan below the Generate.
    """
    load(spark, sf_dir, "documents").createOrReplaceTempView("lv_docs")
    return spark.sql(
        """
        SELECT doc_id, token, CAST(length(token) AS BIGINT) AS tok_len
        FROM lv_docs
        LATERAL VIEW explode(split(text, ' ')) toks AS token
        WHERE doc_id < 50
        """
    )


@register(
    "sql_exists_projection",
    oracle="""
SELECT c_custkey,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_totalprice > 200000) AS has_big_order,
       EXISTS (SELECT 1 FROM orders o
               WHERE o.o_custkey = c.c_custkey
                 AND o.o_orderstatus = 'F') AS has_finished
FROM customer c WHERE c_custkey < 200
""",
    tier="T2",
)
def sql_exists_projection(spark, sf_dir):
    """EXISTS as a SELECT-list expression (scalar boolean projection, not a
    WHERE filter): flag columns computed from correlated subqueries — the
    feature-engineering spelling (has_big_order / has_finished become
    model features), distinct from the filtering EXISTS of q21. Catalyst
    decorrelates each flag into an ExistenceJoin (a left join producing
    the boolean), so two flags cost two hash joins, never per-row
    re-execution.

    Determinism: pure booleans over exact predicates. Scale note: each
    existence join is custkey-keyed (broadcastable probe here); the
    pushed c_custkey < 200 bound reaches both the customer scan and —
    via the join key — the orders side under DPP-style filter pushdown.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("exists_customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("exists_orders")
    return spark.sql(
        """
        SELECT c_custkey,
               EXISTS (SELECT 1 FROM exists_orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 200000) AS has_big_order,
               EXISTS (SELECT 1 FROM exists_orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderstatus = 'F') AS has_finished
        FROM exists_customer c WHERE c_custkey < 200
        """
    )


@register(
    "sql_ctas_dml",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_totalprice > 150000
GROUP BY o_orderpriority
UNION ALL
SELECT '_manual', 2, 99900 + 100
""",
    tier="T2",
)
def sql_ctas_dml(spark, sf_dir):
    """Catalog DML surface: CREATE TABLE AS SELECT materializes an
    aggregate into the session catalog (managed parquet), INSERT INTO
    VALUES appends manual rows, and the read-back must equal the
    recomputed aggregate plus the inserts — the
    publish-then-append-corrections workflow every curated mart uses.
    CREATE OR REPLACE makes the key rerun-idempotent.

    Determinism: exact aggregates; the manual rows are literals. Scale
    note: CTAS is just the SELECT's plan plus a parquet sink (same
    partial+final aggregate); INSERT INTO VALUES is a single-task append
    of a LocalRelation — no shuffle; the read-back scans the managed
    table like any parquet source.
    """
    import os
    import shutil

    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_ctas_src")
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    tbl = f"swallow_ctas_priority_agg_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    # a table dropped by a PREVIOUS session leaves its managed location
    # behind (this session's catalog never knew it) — clear the dir so
    # CREATE TABLE can't hit LOCATION_ALREADY_EXISTS
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    shutil.rmtree(os.path.join(wh.removeprefix("file:"), tbl), ignore_errors=True)
    spark.sql(
        f"""
        CREATE TABLE {tbl} USING parquet AS
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
        FROM orders_ctas_src
        WHERE o_totalprice > 150000
        GROUP BY o_orderpriority
        """
    )
    spark.sql(
        f"""
        INSERT INTO {tbl}
        VALUES ('_manual', CAST(2 AS BIGINT), CAST(100000 AS BIGINT))
        """
    )
    return spark.sql(f"SELECT o_orderpriority, n, cents FROM {tbl}")


@register(
    "sql_recursive_cte",
    oracle="""
WITH RECURSIVE anc(custkey, anc_key, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer
  UNION ALL
  SELECT a.custkey, a.anc_key // 10, a.depth + 1
  FROM anc a JOIN customer p ON p.c_custkey = a.anc_key // 10
  WHERE a.anc_key >= 10
)
SELECT CAST(depth AS BIGINT) AS depth,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT anc_key) AS BIGINT) AS n_roots,
       CAST(MIN(custkey) AS BIGINT) AS min_custkey,
       CAST(MAX(custkey) AS BIGINT) AS max_custkey
FROM anc WHERE anc_key < 10
GROUP BY depth ORDER BY depth
""",
    tier="T2",
)
def sql_recursive_cte(spark, sf_dir):
    """WITH RECURSIVE (Spark 4's recursive CTE) walking a hierarchy to its
    roots: every customer climbs the deterministic B-ary tree
    parent = custkey DIV 10 (the org-chart / filesystem shape), the
    recursive step gated on the parent row actually existing via an equi
    join — the UnionLoop-with-join plan, not arithmetic-only recursion.
    Reports the depth histogram with per-depth root counts and custkey
    extent; chains terminate at the single-digit roots.

    Determinism: pure integer arithmetic (DIV == DuckDB's // on
    non-negative keys) and exact counts — no floats anywhere.

    Scale note: recursion depth is log10(max custkey) (~7 levels at 100
    TB), each level one hash equi-join of the frontier against the dim's
    key — Spark materializes each UnionLoop iteration, so this is the
    bounded-iteration join-per-level shape, with the final aggregate a
    tiny depth-keyed rollup. The WHERE anc_key >= 10 guard bounds the
    frontier monotonically.
    """
    load(spark, sf_dir, "customer").createOrReplaceTempView("rc_customer")
    return spark.sql(
        """
        WITH RECURSIVE anc(custkey, anc_key, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM rc_customer
          UNION ALL
          SELECT a.custkey, a.anc_key DIV 10, a.depth + 1
          FROM anc a JOIN rc_customer p ON p.c_custkey = a.anc_key DIV 10
          WHERE a.anc_key >= 10
        )
        SELECT CAST(depth AS BIGINT) AS depth,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(COUNT(DISTINCT anc_key) AS BIGINT) AS n_roots,
               CAST(MIN(custkey) AS BIGINT) AS min_custkey,
               CAST(MAX(custkey) AS BIGINT) AS max_custkey
        FROM anc WHERE anc_key < 10
        GROUP BY depth ORDER BY depth
        """
    )
