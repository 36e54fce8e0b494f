"""Differential fuzzing (SURVEY.md §5.2): hypothesis generates random
filter + group-by + aggregate shapes over lineitem/orders; each is built
twice — once with the engine's operators, once as DuckDB SQL — and must
value-match exactly. Catches cross-engine parity edges the fixed query
corpus can't reach."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from swallow_spark.conform import money_sum, sql_money_sum
from swallow_spark.io import load
from tools.oracle_diff import canon

SF = "/root/testdata/sf0.001"

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
KEY_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
CMPS = [">", ">=", "<", "<=", "="]

shape = st.fixed_dictionaries(
    {
        "filter_col": st.sampled_from(NUM_COLS),
        "cmp": st.sampled_from(CMPS),
        # fixture floats are 2dp; 2dp literals make = comparisons meaningful
        "threshold": st.integers(min_value=0, max_value=5000).map(lambda v: v / 100),
        "group_cols": st.lists(st.sampled_from(KEY_COLS), min_size=1, max_size=2, unique=True),
        "agg_col": st.sampled_from(NUM_COLS),
        "second_pred": st.booleans(),
    }
)


@pytest.fixture(scope="module")
def duck001():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    yield con
    con.close()


win_shape = st.fixed_dictionaries(
    {
        "part_col": st.sampled_from(["o_orderstatus", "o_orderpriority"]),
        "order_col": st.sampled_from(["o_totalprice", "o_orderdate"]),
        "desc": st.booleans(),
        "k": st.integers(min_value=1, max_value=5),
        "fn": st.sampled_from(["row_number", "rank", "dense_rank"]),
    }
)


@pytest.fixture(scope="module")
def duck_orders():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    yield con
    con.close()


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(win_shape)
def test_random_window_topk(spark, duck_orders, s):
    from pyspark.sql.window import Window

    direction = "DESC" if s["desc"] else "ASC"
    sql = f"""
        SELECT o_orderkey, {s['part_col']} AS pk, CAST(rn AS BIGINT) AS rn
        FROM (
          SELECT o_orderkey, {s['part_col']},
                 {s['fn']}() OVER (PARTITION BY {s['part_col']}
                                   ORDER BY {s['order_col']} {direction},
                                            o_orderkey) AS rn
          FROM orders
        ) WHERE rn <= {s['k']}
    """
    oc = F.col(s["order_col"]).desc() if s["desc"] else F.col(s["order_col"]).asc()
    w = Window.partitionBy(s["part_col"]).orderBy(oc, F.col("o_orderkey"))
    fns = {"row_number": F.row_number, "rank": F.rank, "dense_rank": F.dense_rank}
    sdf = (
        load(spark, SF, "orders")
        .withColumn("rn", fns[s["fn"]]().over(w).cast("long"))
        .filter(F.col("rn") <= s["k"])
        .select("o_orderkey", F.col(s["part_col"]).alias("pk"), "rn")
    )
    scols = sorted(sdf.columns)
    srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
    rel = duck_orders.sql(sql)
    idx = [list(rel.columns).index(c) for c in sorted(rel.columns)]
    drows = sorted(tuple(canon(row[i]) for i in idx) for row in rel.fetchall())
    assert srows == drows, f"shape={s}"


join_shape = st.fixed_dictionaries(
    {
        "how": st.sampled_from(["inner", "left", "right", "full", "semi", "anti"]),
        "cust_bal": st.integers(min_value=-1000, max_value=9000),
        "price_cut": st.integers(min_value=1000, max_value=400000),
    }
)

_HOW_SQL = {
    "inner": "JOIN",
    "left": "LEFT JOIN",
    "right": "RIGHT JOIN",
    "full": "FULL JOIN",
    "semi": "SEMI JOIN",
    "anti": "ANTI JOIN",
}


@pytest.fixture(scope="module")
def duck_two():
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(join_shape)
def test_random_join_types(spark, duck_two, s):
    """All six join types with filtered sides (null-bearing outer results)."""
    semi_anti = s["how"] in ("semi", "anti")
    proj = "o.o_orderkey" if semi_anti else "o.o_orderkey, c.c_custkey AS ck"
    sql = f"""
        SELECT {proj}
        FROM (SELECT * FROM orders WHERE o_totalprice > {s['price_cut']}) o
        {_HOW_SQL[s['how']]} (SELECT * FROM customer WHERE c_acctbal > {s['cust_bal']}) c
          ON o.o_custkey = c.c_custkey
    """
    o = load(spark, SF, "orders").filter(F.col("o_totalprice") > s["price_cut"])
    c = load(spark, SF, "customer").filter(F.col("c_acctbal") > s["cust_bal"])
    how = {"semi": "left_semi", "anti": "left_anti"}.get(s["how"], s["how"])
    j = o.join(c, o.o_custkey == c.c_custkey, how)
    sdf = (
        j.select("o_orderkey")
        if semi_anti
        else j.select("o_orderkey", F.col("c_custkey").alias("ck"))
    )
    scols = sorted(sdf.columns)
    srows = sorted(tuple(canon(r[x]) for x in scols) for r in sdf.collect())
    rel = duck_two.sql(sql)
    idx = [list(rel.columns).index(x) for x in sorted(rel.columns)]
    drows = sorted(tuple(canon(row[i]) for i in idx) for row in rel.fetchall())
    assert srows == drows, f"shape={s}"


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(shape)
def test_random_filter_group_agg(spark, duck001, s):
    pred_sql = f"{s['filter_col']} {s['cmp']} {s['threshold']}"
    if s["second_pred"]:
        pred_sql += " AND l_linenumber <= 3"
    groups = s["group_cols"]
    sql = f"""
        SELECT {', '.join(groups)},
               CAST(COUNT(*) AS BIGINT) AS n,
               {sql_money_sum(s['agg_col'])} AS total,
               MIN({s['agg_col']}) AS lo,
               MAX({s['agg_col']}) AS hi
        FROM lineitem
        WHERE {pred_sql}
        GROUP BY {', '.join(groups)}
    """
    li = load(spark, SF, "lineitem").filter(F.expr(pred_sql))
    sdf = li.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("n"),
        money_sum(F.col(s["agg_col"])).alias("total"),
        F.min(s["agg_col"]).alias("lo"),
        F.max(s["agg_col"]).alias("hi"),
    )
    scols = sorted(sdf.columns)
    srows = sorted(tuple(canon(r[c]) for c in scols) for r in sdf.collect())
    rel = duck001.sql(sql)
    idx = [list(rel.columns).index(c) for c in sorted(rel.columns)]
    drows = sorted(tuple(canon(row[i]) for i in idx) for row in rel.fetchall())
    assert srows == drows, f"shape={s}"

# Ritual-only suite (VERDICT r11 item 1): exhaustive sweep / mutated-data
# parity / hypothesis battery / timed gate — skipped by a plain pytest run
# so the driver-visible suite finishes; SWALLOW_FULL_TESTS=1 runs it.
pytestmark = pytest.mark.slow
