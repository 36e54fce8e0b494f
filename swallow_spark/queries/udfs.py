"""§2.J — UDF/UDAF/UDTF surface.

UDFs are the fidelity fallback, not the hot path (SURVEY.md §1.2): every key
here has a pure-SQL oracle twin proving the semantics, and all Python paths
are Arrow-batched (pandas_udf / applyInPandas / mapInPandas) except the one
deliberate row-at-a-time example.

Determinism inside Python: float math follows the same canonicalization as
conform.py — integer cent units via np.floor(x*100+0.5), exact int64 sums,
then the identical double-op sequence the oracle SQL uses.
"""

from __future__ import annotations

import sys

# module scope: PySpark resolves stringified type hints (PEP 563, active
# via the future import above) against the function's module globals
from typing import Iterator, Tuple  # noqa: UP035

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..conform import sql_rnd
from ..io import load
from ..registry import register


@register(
    "udf_python_scalar",
    oracle="SELECT c_custkey, upper(reverse(c_name)) AS mangled FROM customer",
    tier="T2",
)
def udf_python_scalar(spark, sf_dir):
    """Plain (row-at-a-time) Python UDF — deterministic string mangle.

    Scale note: this is the ~10-100× slower path vs pandas_udf; kept as the
    API-coverage example only.
    """
    mangle = F.udf(lambda s: s[::-1].upper() if s is not None else None, T.StringType())
    # fan_out measured a LOSS here (round-11 interleaved A/B, 0.65 -> 1.33 s):
    # the per-row work is one string reverse — the added exchange costs more
    # than the single-core pass saves. Left on the scan split.
    c = load(spark, sf_dir, "customer")
    return c.select("c_custkey", mangle("c_name").alias("mangled"))


@register(
    "udf_pandas_scalar",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {sql_rnd('l_extendedprice * (1 - l_discount)', 2)} AS charge
FROM lineitem
""",
    tier="T2",
)
def udf_pandas_scalar(spark, sf_dir):
    """Vectorized Arrow scalar UDF: discounted charge, half-up cents."""
    import numpy as np

    @F.pandas_udf("double")
    def charge(ep: pd.Series, disc: pd.Series) -> pd.Series:
        return np.floor((ep * (1 - disc)) * 100 + 0.5) / 100

    # fan_out measured a LOSS here (round-11 interleaved A/B, 1.17 -> 2.00 s):
    # the vectorized charge expression is microseconds per batch — shuffling
    # 600 k rows to parallelize it costs more than it saves.
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charge("l_extendedprice", "l_discount").alias("charge"),
    )


@register(
    "udaf_pandas_grouped",
    oracle=f"""
WITH ev AS (
  SELECT event_type, value,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN props END AS props
  FROM events
),
c AS (
  SELECT event_type,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS u,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM ev
  WHERE value IS NOT NULL AND json_extract_string(props, '$.k') IS NOT NULL
)
SELECT event_type,
       {sql_rnd('CAST(SUM(u * k) AS DOUBLE) / 100 / SUM(k)', 4)} AS wavg_value
FROM c
GROUP BY event_type
""",
    tier="T2",
)
def udaf_pandas_grouped(spark, sf_dir):
    """Grouped-agg pandas UDF: value mean weighted by the JSON `k` prop.

    Exact int64 unit sums inside the UDF → order-independent, so the Arrow
    partial batches can arrive in any order and still match the SQL twin.
    NULL-measure rows are dropped on BOTH sides before any arithmetic (the
    NULL drift probe caught np.floor(NaN).astype(int64) producing garbage).
    """
    import numpy as np

    @F.pandas_udf("double")
    def wavg(v: pd.Series, k: pd.Series) -> float:
        u = np.floor(v.to_numpy() * 100 + 0.5).astype("int64")
        kk = k.to_numpy().astype("int64")
        raw = float((u * kk).sum()) / 100 / float(kk.sum())
        return float(np.floor(raw * 10000 + 0.5) / 10000)

    e = (
        load(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .filter(F.col("value").isNotNull() & F.col("k").isNotNull())
    )
    return e.groupBy("event_type").agg(wavg("value", "k").alias("wavg_value"))


@register(
    "udf_grouped_map_zscore",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS u
  FROM events
  WHERE value IS NOT NULL
),
s AS (
  SELECT event_type, CAST(SUM(u) AS DOUBLE) AS scd,
         CAST(SUM(u * u) AS DOUBLE) AS s2d, COUNT(*) AS n
  FROM c GROUP BY event_type
)
SELECT event_id, event_type,
       FLOOR(((u - scd / n) / sqrt((s2d - scd * scd / n) / (n - 1))) * 10000 + 0.5)
         / 10000 AS z
FROM c JOIN s USING (event_type)
""",
    tier="T2",
)
def udf_grouped_map_zscore(spark, sf_dir):
    """Grouped-map applyInPandas: per-event-type z-score normalization.

    Moments are computed from exact integer sums (sum of cents, sum of
    squared cents), then one fixed double-op sequence — bit-identical to the
    SQL twin regardless of row order inside the Arrow batch. NULL-value
    events are filtered on BOTH sides before the moments (NULL drift probe).
    """
    import numpy as np

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        u = np.floor(pdf["value"].to_numpy() * 100 + 0.5).astype("int64")
        n = len(u)
        scd = float(u.sum())
        s2d = float((u * u).sum())
        std = np.sqrt((s2d - scd * scd / n) / (n - 1))
        z = (u - scd / n) / std
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "z": np.floor(z * 10000 + 0.5) / 10000,
            }
        )

    e = (
        load(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("value").isNotNull())
    )
    return e.groupBy("event_type").applyInPandas(
        normalize, "event_id long, event_type string, z double"
    )


@register(
    "udf_map_in_pandas",
    oracle="""
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents
""",
    tier="T2",
)
def udf_map_in_pandas(spark, sf_dir):
    """Partition-wise mapInPandas tokenizer (batch explode in Python).

    Scale note: mapInPandas streams Arrow batches — constant memory per
    partition; the shuffle after carries only (doc_id, token).
    """

    def tokenize(batches):
        for pdf in batches:
            out = pdf[["doc_id", "text"]].copy()
            out["token"] = out["text"].str.split(" ")
            # NULL text → no rows, mirroring DuckDB's unnest(NULL) (pandas
            # explode would otherwise keep one NaN-token row)
            yield out.explode("token").dropna(subset=["token"])[["doc_id", "token"]]

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(tokenize, "doc_id long, token string")


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
""",
    tier="T2",
)
def udf_map_in_arrow(spark, sf_dir):
    """mapInArrow: zero-copy RecordBatch-level transform (the lowest-overhead
    Python boundary — no pandas materialization)."""
    import pyarrow as pa

    def count_tokens(batches):
        for batch in batches:
            texts = batch.column("text").to_pylist()
            yield pa.RecordBatch.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_tokens": pa.array(
                        # NULL text → NULL count (string_split(NULL) is NULL)
                        [None if t is None else len(t.split(" ")) for t in texts],
                        type=pa.int64(),
                    ),
                }
            )

    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(count_tokens, "doc_id long, n_tokens long")


@register(
    "udtf_python",
    oracle="""
SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, t.arr[g.i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) t,
     LATERAL (SELECT unnest(generate_series(1, len(t.arr))) AS i) g
""",
    tier="T2",
)
def udtf_python(spark, sf_dir):
    """Spark 4 Python UDTF: lateral-join token explode with positions."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for pos, token in enumerate(text.split(" ")):
                yield pos, token

    spark.udtf.register("swallow_tokenize", Tokenize)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.pos, t.token "
        "FROM udtf_docs, LATERAL swallow_tokenize(text) t"
    )


@register(
    "udf_arrow_scalar",
    oracle="""
SELECT o_orderkey,
       CAST(length(CAST(o_orderkey AS VARCHAR)) AS BIGINT) AS n_digits,
       CAST(list_sum(list_transform(string_split_regex(CAST(o_orderkey AS VARCHAR), ''),
                                    c -> TRY_CAST(c AS BIGINT))) AS BIGINT) AS digit_sum
FROM orders
""",
    tier="T2",
)
def udf_arrow_scalar(spark, sf_dir):
    """Arrow-OPTIMIZED row UDF (`@udf(useArrow=True)`, Spark 4): plain
    Python semantics per row, but values cross the JVM↔Python boundary in
    Arrow record batches instead of pickled rows — the drop-in upgrade for
    legacy row UDFs that can't be rewritten as vectorized pandas_udfs.
    Deterministic integer digit arithmetic, exact in both engines.

    Scale note: Arrow serialization removes the pickle tax (~2-5× on wide
    rows) but per-row Python bytecode still runs — pandas_udf remains the
    true vectorized path (udf_pandas_scalar)."""

    @F.udf("long", useArrow=True)
    def digit_sum(x: int) -> int:
        return sum(int(c) for c in str(x))

    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.length(F.col("o_orderkey").cast("string")).cast("long").alias("n_digits"),
        digit_sum("o_orderkey").alias("digit_sum"),
    )


@register(
    "udtf_polymorphic",
    oracle="""
SELECT doc_id,
       arr[1] AS part0, arr[2] AS part1, arr[3] AS part2, arr[4] AS part3
FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents)
""",
    tier="T2",
)
def udtf_polymorphic(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4): the static analyze() hook derives
    the output schema from the call site's literal argument — here
    first_n(text, 4) emits columns part0..part3, but first_n(text, 2)
    would emit two. This is the table-function shape connectors use for
    schema-on-call sources (swallow's dynamic-mapping readers). DuckDB
    oracle: plain list indexing (out-of-range → NULL, matching eval's
    padding).

    Scale note: same execution profile as a plain UDTF — Arrow-batched
    lateral, one Python worker pass, no shuffle."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class FirstN:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            st = StructType()
            for i in range(n.value):
                st = st.add(f"part{i}", "string")
            return AnalyzeResult(schema=st)

        def eval(self, text: str, n: int):
            # NULL text → one all-NULL row (the doc survives the lateral),
            # matching the oracle's list-index-of-NULL semantics
            toks = text.split(" ") if text is not None else []
            yield tuple(toks[i] if i < len(toks) else None for i in range(n))

    spark.udtf.register("swallow_first_n", FirstN)
    d = load(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        "SELECT doc_id, t.* FROM udtf_poly_docs, LATERAL swallow_first_n(text, 4) t"
    )


@register(
    "udf_pandas_iter",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {sql_rnd('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 2)} AS charged
FROM lineitem
""",
    tier="T2",
)
def udf_pandas_iter(spark, sf_dir):
    """ITERATOR-form pandas UDF (`Iterator[pd.Series] -> Iterator[pd.Series]`,
    §2.J): the variant for UDFs with expensive one-time setup — the
    initialization (here a closure-built constant pipeline; in production a
    model/tokenizer load) happens ONCE PER PYTHON WORKER, then every Arrow
    batch streams through it, instead of paying setup per batch like the
    plain scalar form. Arithmetic mirrors the oracle exactly (floor half-up
    cents).

    Scale note: identical execution profile to udf_pandas_scalar per batch;
    the iterator form is strictly better whenever setup cost is nonzero —
    at 1000 executors a 2 s model load happens 1000×, not
    1000 × batches×."""
    import numpy as np

    @F.pandas_udf("double")
    def charged(
        it: Iterator[Tuple[pd.Series, pd.Series, pd.Series]],
    ) -> Iterator[pd.Series]:
        # one-time setup per worker (stand-in for a model/tokenizer load)
        cents = 100.0
        for ep, disc, tax in it:
            yield np.floor(ep * (1 - disc) * (1 + tax) * cents + 0.5) / cents

    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        charged("l_extendedprice", "l_discount", "l_tax").alias("charged"),
    )


@register(
    "udf_window_weighted_ma",
    oracle="""
WITH daily AS (
  SELECT DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS mon,
         CAST(o_orderdate AS DATE) AS day,
         SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1, 2
)
SELECT day, CAST(cents AS BIGINT) AS cents,
       CASE
         WHEN lag(cents, 2) OVER win IS NOT NULL THEN
           CAST(1 * lag(cents, 2) OVER win + 2 * lag(cents, 1) OVER win
                + 3 * cents AS DOUBLE) / 6.0
         WHEN lag(cents, 1) OVER win IS NOT NULL THEN
           CAST(1 * lag(cents, 1) OVER win + 2 * cents AS DOUBLE) / 3.0
         ELSE CAST(cents AS DOUBLE)
       END AS wma3
FROM daily
WINDOW win AS (PARTITION BY mon ORDER BY day)
""",
    tier="T2",
)
def udf_window_weighted_ma(spark, sf_dir):
    """Pandas UDF over a BOUNDED WINDOW FRAME (§2.J surface not covered by
    the grouped-agg key): a linearly-weighted 3-day moving average of daily
    order revenue, computed by a grouped-agg pandas UDF applied
    `.over(rowsBetween(-2, 0))` — Spark ships each frame to Python as one
    Arrow batch in frame order. The oracle spells the same weighted average
    with explicit lag() arithmetic (frames of length 1/2/3 re-base weights
    to 1..len, exactly what positional weighting over a short frame means).

    Determinism: the numerator is an exact int64 dot product of cent values
    with integer weights (np.int64 arithmetic in Python, BIGINT in DuckDB);
    a single double division by the exact weight sum (1.0/3.0/6.0) follows
    — bit-identical on both engines. int64 headroom: daily cents ~1e10 at
    sf0.1, x3 weight ~ 3e12 at sf100 — 6 orders below overflow.

    Scale note: frames are per-MONTH partitions of a calendar-bounded daily
    aggregate (<=31 rows each), so the Python window path touches thousands
    of rows regardless of fact-table scale; the heavy lifting (the daily
    cents rollup) is a plain partial-agg shuffle.
    """
    from pyspark.sql.window import Window

    @F.pandas_udf("double")
    def _wma(v: pd.Series) -> float:
        import numpy as np

        a = v.to_numpy(dtype="int64")
        wts = np.arange(1, len(a) + 1, dtype="int64")
        return float(int((a * wts).sum())) / float(int(wts.sum()))

    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    daily = o.groupBy(
        F.trunc(F.col("o_orderdate").cast("date"), "month").alias("mon"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).agg(F.sum(F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")).alias("cents"))
    w = Window.partitionBy("mon").orderBy("day").rowsBetween(-2, Window.currentRow)
    return daily.select("day", "cents", _wma("cents").over(w).alias("wma3"))


@register(
    "udf_apply_in_arrow",
    oracle="""
WITH c AS (
  SELECT event_id, event_type, CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT event_type, SUM(cents) // COUNT(*) AS mean_c FROM c GROUP BY event_type
)
SELECT c.event_id, c.event_type,
       CAST(c.cents - m.mean_c AS BIGINT) AS dev_cents
FROM c JOIN m USING (event_type)
""",
    tier="T2",
)
def udf_apply_in_arrow(spark, sf_dir):
    """Grouped-map via applyInArrow (Spark 4's pandas-free grouped map —
    each group arrives as a raw pyarrow.Table, zero pandas conversion
    cost): demean event values within each event_type using an exact
    integer floor-mean, emitting per-row deviations in cents.

    Determinism: all arithmetic is int64 (cents, exact group sum, floor
    division) — no float accumulation anywhere, so group partitioning and
    Arrow batch boundaries cannot change a single output bit. The oracle
    spells the same floor-mean with BIGINT // .

    Scale note: one shuffle on event_type; inside each group the compute is
    a vectorized numpy pass over Arrow buffers (no per-row Python). Wide
    groups stream as multiple record batches within one Table. For skewed
    group keys the salting template (ops/relational.salted_join) applies,
    but a 5-value demean is better served by the pure-SQL window twin —
    this key exists to prove the applyInArrow seam.
    """
    import pyarrow as pa

    def _demean(tbl: pa.Table) -> pa.Table:
        import numpy as np

        cents = tbl.column("cents").to_numpy(zero_copy_only=False).astype("int64")
        mean_c = int(cents.sum()) // len(cents)
        return pa.table(
            {
                "event_id": tbl.column("event_id"),
                "event_type": tbl.column("event_type"),
                "dev_cents": pa.array(cents - mean_c, type=pa.int64()),
            }
        )

    e = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    c = e.select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    return c.groupBy("event_type").applyInArrow(
        _demean, schema="event_id long, event_type string, dev_cents long"
    )


@register(
    "udtf_table_argument",
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
lagged AS (
  SELECT event_type, day, n,
         LAG(day) OVER w AS pday,
         LAG(n) OVER w AS pn
  FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day)
),
runs AS (
  SELECT event_type, day, n,
         SUM(CASE WHEN pn IS NULL OR n <= pn THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
  FROM lagged
),
streak AS (
  SELECT event_type, CAST(MAX(cnt) AS BIGINT) AS longest_rise
  FROM (SELECT event_type, isl, COUNT(*) AS cnt
        FROM runs GROUP BY event_type, isl)
  GROUP BY event_type
),
gaps AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(COALESCE(MAX(datediff('day', pday, day)), 0) AS BIGINT)
           AS max_gap_days
  FROM lagged GROUP BY event_type
)
SELECT g.event_type, g.n_days, g.max_gap_days, s.longest_rise
FROM gaps g JOIN streak s ON s.event_type = g.event_type
""",
    tier="T2",
)
def udtf_table_argument(spark, sf_dir):
    """Python UDTF with a TABLE argument (Spark 4 §2.J surface):
    `FROM series_stats(TABLE(daily) PARTITION BY event_type ORDER BY day)`
    streams each stream's day-ordered rows through ONE stateful UDTF
    instance per partition — the per-entity sequential-model shape
    (sessionizers, fold-based detectors) that scalar UDFs cannot express
    because they see rows independently. The UDTF walks the ordered
    series imperatively: day count, max calendar gap, longest strictly-
    rising run of daily counts; the oracle re-derives all three with
    window/gaps-and-islands SQL, proving both the partitioning AND the
    ordering contract of the TABLE argument.

    Determinism: pure integer outputs from an explicitly ordered walk.
    Scale note: PARTITION BY shuffles once on event_type and feeds each
    partition through Arrow to one Python instance — state is O(1) per
    partition (the fold discipline), and the input is the pre-aggregated
    DAILY table, never raw events.
    """
    from pyspark.sql.functions import udtf

    @udtf(returnType="event_type string, n_days bigint, max_gap_days bigint,"
          " longest_rise bigint")
    class SeriesStats:
        def __init__(self):
            self.et = None
            self.n_days = 0
            self.prev_day = None
            self.prev_n = None
            self.max_gap = 0
            self.run = 0
            self.best_run = 0

        def eval(self, row):
            self.et = row["event_type"]
            self.n_days += 1
            if self.prev_day is not None:
                gap = (row["day"] - self.prev_day).days
                if gap > self.max_gap:
                    self.max_gap = gap
            if self.prev_n is not None and row["n"] > self.prev_n:
                self.run += 1
            else:
                self.run = 1
            if self.run > self.best_run:
                self.best_run = self.run
            self.prev_day = row["day"]
            self.prev_n = row["n"]

        def terminate(self):
            if self.et is not None:
                yield self.et, self.n_days, self.max_gap, self.best_run

    spark.udtf.register("swallow_series_stats", SeriesStats)
    e = load(spark, sf_dir, "events")
    (
        e.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .createOrReplaceTempView("udtf_daily")
    )
    return spark.sql(
        "SELECT * FROM swallow_series_stats(TABLE(udtf_daily)"
        " PARTITION BY event_type ORDER BY day)"
    )


@register(
    "udf_pandas_struct",
    oracle="""
SELECT o_orderkey,
       CAST(length(CAST(o_orderkey AS VARCHAR)) AS BIGINT) AS n_digits,
       CAST(list_sum(list_transform(
              string_split_regex(CAST(o_orderkey AS VARCHAR), ''),
              c -> TRY_CAST(c AS BIGINT))) AS BIGINT) AS digit_sum,
       CAST(o_orderkey % 9 AS BIGINT) AS mod9
FROM orders WHERE o_orderkey < 3000
""",
    tier="T2",
)
def udf_pandas_struct(spark, sf_dir):
    """Vectorized pandas UDF returning a STRUCT — the multi-output
    feature-extractor shape: one Arrow round trip computes three derived
    columns (digit count, digit sum, mod-9 residue) instead of three
    separate UDF passes over the same input, then the struct flattens
    into scalar columns for the output contract. The digit-sum ≡ mod-9
    relation (casting out nines) doubles as an internal consistency
    check the oracle verifies independently.

    Determinism: pure integer arithmetic on exact keys. Scale note: ONE
    JVM↔Python Arrow transfer per batch regardless of output arity — the
    reason multi-output extractors should return structs; the key bound
    (< 3000) is pushed to the parquet scan before any Python runs.
    """
    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("n_digits bigint, digit_sum bigint, mod9 bigint")
    def digit_features(k: pd.Series) -> pd.DataFrame:
        s = k.astype("string")
        return pd.DataFrame(
            {
                "n_digits": s.str.len().astype("int64"),
                "digit_sum": s.map(lambda x: sum(int(c) for c in x)).astype("int64"),
                "mod9": (k % 9).astype("int64"),
            }
        )

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000)
    return o.select(
        "o_orderkey", digit_features(F.col("o_orderkey")).alias("fx")
    ).select(
        "o_orderkey",
        F.col("fx.n_digits").alias("n_digits"),
        F.col("fx.digit_sum").alias("digit_sum"),
        F.col("fx.mod9").alias("mod9"),
    )


@register(
    "udf_cogrouped_merge",
    oracle="""
WITH o AS (
  SELECT o_custkey AS k,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(COALESCE(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)), 0)
              AS BIGINT) AS spend_cents
  FROM orders GROUP BY 1
),
e AS (
  SELECT user_id AS k,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COALESCE(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)), 0)
              AS BIGINT) AS value_cents
  FROM events GROUP BY 1
)
SELECT COALESCE(o.k, e.k) AS k,
       CAST(COALESCE(o.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(o.spend_cents, 0) AS BIGINT) AS spend_cents,
       CAST(COALESCE(e.n_events, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(e.value_cents, 0) AS BIGINT) AS value_cents
FROM o FULL JOIN e ON o.k = e.k
""",
    tier="T2",
)
def udf_cogrouped_merge(spark, sf_dir):
    """The COGROUPED pandas surface — groupBy().cogroup().applyInPandas —
    the one grouped-UDF shape the rest of §2.J doesn't touch: both tables
    shuffle on the SAME key and each Python call receives the key's two
    aligned pandas frames (either possibly empty — keys living in only one
    table still fire, which is how the full-outer semantics emerge without
    a join node). Here: per-customer order panel ⋈ event panel merged into
    one activity summary; the oracle proves it against a plain FULL OUTER
    JOIN of the two aggregates.

    SCALE SHAPE (round-7 rework): cogrouping directly on the customer key
    fires one Python call PER KEY — ~15k interpreter round-trips at sf0.1,
    ~9s of pure invocation overhead. Instead both sides cogroup on a
    256-way HASH SUPER-GROUP pmod(xxhash64(k), 256) and each call regroups
    its batch per-key VECTORIZED (pandas groupby + outer merge): identical
    output (the unchanged FULL-OUTER-JOIN oracle pins the rewrite), 256
    Python calls total, and the per-call work is columnar. This is the
    general recipe for any high-cardinality cogrouped UDF: coarsen the
    shuffle key, keep the per-key logic inside the batch. null keys: both
    engines group NULL keys together (cogroup grouping semantics);
    pandas reproduces that via groupby(dropna=False) + NaN-matching merge,
    and the nullable Int64 k column carries the NULL group out.

    Determinism inside Python: the conform recipe — np.floor(x*100+0.5)
    per element (identical IEEE to the engines' FLOOR), NULLs arrive as
    NaN and contribute 0 via nan_to_num (≡ SQL SUM ignoring NULLs with
    all-NULL COALESCE 0), per-key cent sums are exact-integer-valued
    float64 well under 2^53 before the int64 cast.

    Scale note: ONE co-partitioned shuffle of each input on the bucket —
    the same bytes moved as the per-key shuffle (the payload rows, not the
    buckets, dominate) — and 256 buckets spread evenly under xxhash64, so
    no straggler; this is the escape hatch for merge logic SQL can't
    express (per-key model scoring over two aligned panels, custom as-of
    semantics), at join-shaped cost.
    """
    import numpy as np

    # Explicit hash repartition on the super-group (round-11, guide §2):
    # the cogroup exchange is byte-light (a few MB) but CPU-dense (pandas
    # regroup+merge per bucket), and AQE's byte-based coalescing collapsed
    # it to ~3 tasks. A user-specified repartition count is exempt from AQE
    # coalescing and satisfies the cogroup's hash-partitioning requirement,
    # so the Python stage runs at defaultParallelism (capped by the 256
    # buckets) at any scale. Measured 3.6 -> 2.2 s at sf0.1/local[32].
    n_par = spark.sparkContext.defaultParallelism
    o = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"), "o_totalprice")
        .withColumn("b", F.pmod(F.xxhash64("k"), F.lit(256)))
        .repartition(n_par, "b")
    )
    e = (
        load(spark, sf_dir, "events")
        .select(F.col("user_id").alias("k"), "value")
        .withColumn("b", F.pmod(F.xxhash64("k"), F.lit(256)))
        .repartition(n_par, "b")
    )

    def _side(df: pd.DataFrame, col: str, cnt: str, tot: str) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "k": pd.Series(dtype="float64"),
                    cnt: pd.Series(dtype="int64"),
                    tot: pd.Series(dtype="float64"),
                }
            )
        cents = np.nan_to_num(
            np.floor(df[col].to_numpy(dtype="float64") * 100 + 0.5)
        )
        return (
            pd.DataFrame({"k": df["k"], "c": cents})
            .groupby("k", dropna=False, sort=False)
            .agg(**{cnt: ("c", "size"), tot: ("c", "sum")})
            .reset_index()
        )

    def merge(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        lg = _side(left, "o_totalprice", "n_orders", "spend_cents")
        rg = _side(right, "value", "n_events", "value_cents")
        m = lg.merge(rg, on="k", how="outer")
        return pd.DataFrame(
            {
                "k": m["k"].astype("Int64"),
                "n_orders": m["n_orders"].fillna(0).astype("int64"),
                "spend_cents": m["spend_cents"].fillna(0).astype("int64"),
                "n_events": m["n_events"].fillna(0).astype("int64"),
                "value_cents": m["value_cents"].fillna(0).astype("int64"),
            }
        )

    return (
        o.groupBy("b")
        .cogroup(e.groupBy("b"))
        .applyInPandas(
            merge,
            "k long, n_orders long, spend_cents long, n_events long, "
            "value_cents long",
        )
    )


_COGROUP_ARROW_SQL = """
WITH o AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS max_order_cents
  FROM orders GROUP BY o_custkey
),
e AS (
  SELECT user_id AS k, CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(MIN(CASE WHEN value IS NOT NULL
                       THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END)
              AS BIGINT) AS min_event_cents
  FROM events WHERE user_id IS NOT NULL GROUP BY user_id
)
SELECT COALESCE(o.k, e.k) AS k,
       COALESCE(o.n_orders, 0) AS n_orders,
       o.max_order_cents,
       COALESCE(e.n_events, 0) AS n_events,
       e.min_event_cents
FROM o FULL OUTER JOIN e ON o.k = e.k
ORDER BY k
"""


@register("udf_cogrouped_arrow", oracle=_COGROUP_ARROW_SQL, tier="T2")
def udf_cogrouped_arrow(spark, sf_dir):
    """The COGROUPED **Arrow** surface — groupBy().cogroup().applyInArrow —
    the zero-copy sibling of [[udf_cogrouped_merge]]: each Python call
    receives the key's two aligned pyarrow.Tables (no pandas conversion,
    no NaN coercion — Arrow keeps int64 nullability intact, which is why
    the min/max here need no NaN dance). Per customer: order count + max
    order cents reconciled against event count + min event cents; keys
    present on one side only still fire with an empty table — the
    full-outer semantics, proven against a FULL OUTER JOIN oracle.

    SCALE SHAPE (round-7 rework, same recipe as [[udf_cogrouped_merge]]):
    cogroup on a 256-way hash super-group pmod(xxhash64(k), 256) instead
    of the raw key — 256 Python calls instead of one per customer — and
    regroup per-key inside the batch with pyarrow group_by + a pyarrow
    full-outer join, never leaving Arrow. The unchanged FULL-OUTER-JOIN
    oracle pins the rewrite output-identical. (Both sides are
    null-key-free here — the event side filters user_id IS NOT NULL and
    o_custkey is non-null — so Arrow's SQL-style non-null-matching join
    is exactly the cogroup grouping semantics.)

    Determinism inside Python: floor(x·100+0.5) per element via pyarrow
    compute (same IEEE ops as the engines' FLOOR), min/max over exact
    int64 — no float aggregate anywhere; Arrow min/max skip nulls like
    SQL, and count(mode="all") is the row count COUNT(*) needs.

    Scale note: identical cost shape to cogrouped pandas (one
    co-partitioned shuffle per side), but Arrow batches skip the
    pandas materialization — the right default when the per-key logic is
    columnar.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    # Explicit hash repartition on the super-group: see udf_cogrouped_merge
    # — keeps the CPU-dense Arrow stage at defaultParallelism instead of
    # AQE's byte-coalesced ~3 tasks.
    n_par = spark.sparkContext.defaultParallelism
    o = (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("k"), "o_totalprice")
        .withColumn("b", F.pmod(F.xxhash64("k"), F.lit(256)))
        .repartition(n_par, "b")
    )
    e = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select(F.col("user_id").alias("k"), "value")
        .withColumn("b", F.pmod(F.xxhash64("k"), F.lit(256)))
        .repartition(n_par, "b")
    )

    def _cents(col: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.cast(
            pc.floor(pc.add(pc.multiply(col, 100.0), 0.5)), pa.int64()
        )

    def _empty(names):
        return pa.table({n: pa.array([], pa.int64()) for n in names})

    def merge(left: pa.Table, right: pa.Table) -> pa.Table:
        if left.num_rows:
            lt = (
                pa.table({"k": left.column("k"), "oc": _cents(left.column("o_totalprice"))})
                .group_by("k")
                .aggregate(
                    [("oc", "max"), ("oc", "count", pc.CountOptions(mode="all"))]
                )
            )
            lt = pa.table(
                {
                    "k": lt.column("k"),
                    "max_order_cents": lt.column("oc_max"),
                    "n_orders": lt.column("oc_count"),
                }
            )
        else:
            lt = _empty(["k", "max_order_cents", "n_orders"])
        if right.num_rows:
            rt = (
                pa.table({"k": right.column("k"), "ec": _cents(right.column("value"))})
                .group_by("k")
                .aggregate(
                    [("ec", "min"), ("ec", "count", pc.CountOptions(mode="all"))]
                )
            )
            rt = pa.table(
                {
                    "k": rt.column("k"),
                    "min_event_cents": rt.column("ec_min"),
                    "n_events": rt.column("ec_count"),
                }
            )
        else:
            rt = _empty(["k", "min_event_cents", "n_events"])
        m = lt.join(rt, keys="k", join_type="full outer")
        zero = pa.scalar(0, pa.int64())
        return pa.table(
            {
                "k": m.column("k"),
                "n_orders": pc.coalesce(m.column("n_orders"), zero),
                "max_order_cents": m.column("max_order_cents"),
                "n_events": pc.coalesce(m.column("n_events"), zero),
                "min_event_cents": m.column("min_event_cents"),
            }
        )

    return (
        o.groupBy("b")
        .cogroup(e.groupBy("b"))
        .applyInArrow(
            merge,
            "k long, n_orders long, max_order_cents long, n_events long, "
            "min_event_cents long",
        )
        .orderBy("k")
    )
