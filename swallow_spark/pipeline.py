"""Pipeline API façade (E1 surface, SURVEY.md §3.2) — the swallow-equivalent
reader → process-chain → writer programming model, compiled to one declarative
Spark plan.

The reference's model (SURVEY.md §1.1): a reader produces records, a chain of
per-record process functions transforms them (flatMap semantics: a step may
drop or fan out), a writer consumes them, with process-level parallelism.
Here each step appends DataFrame transformations, so the whole chain becomes
a single Catalyst-optimized job — predicate pushdown and column pruning reach
through every step, and parallelism is cluster-wide instead of a process
count.

    Pipeline(
        source=ParquetSource("/data/sf0.1", "orders"),
        steps=[
            Filter("o_totalprice > 1000"),
            WithColumn("yr", "year(o_orderdate)"),
            Join(ParquetSource("/data/sf0.1", "customer"),
                 on="o_custkey = c_custkey", how="inner", broadcast=True),
            Aggregate(by=["c_mktsegment", "yr"],
                      aggs={"n": "count(1)", "total": "sum(o_totalprice)"}),
        ],
        sink=ParquetSink("/out/seg_year", partition_by=["yr"]),
    ).run(spark)

Error handling: `FlatMapPandas` + `Filter` give the skip-bad-record pattern;
corrupt source rows route via PERMISSIVE reads (queries/sources_sinks.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io import load
from .session import conform_session

# --------------------------------------------------------------- sources


@dataclass(frozen=True)
class ParquetSource:
    sf_dir: str
    table: str

    def read(self, spark: SparkSession) -> DataFrame:
        return load(spark, self.sf_dir, self.table)


@dataclass(frozen=True)
class FileSource:
    """csv / json source with explicit schema (schema-on-read)."""

    path: str
    fmt: str  # "csv" | "json"
    schema: object = None
    options: dict = field(default_factory=dict)

    def read(self, spark: SparkSession) -> DataFrame:
        conform_session(spark)
        r = spark.read
        if self.schema is not None:
            r = r.schema(self.schema)
        for k, v in self.options.items():
            r = r.option(k, v)
        return getattr(r, self.fmt)(self.path)


# ----------------------------------------------------------------- steps


@dataclass(frozen=True)
class Filter:
    predicate: str  # SQL expression

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(F.expr(self.predicate))


@dataclass(frozen=True)
class Project:
    columns: list[str]  # names or SQL expressions with aliases

    def apply(self, df: DataFrame) -> DataFrame:
        return df.selectExpr(*self.columns)


@dataclass(frozen=True)
class WithColumn:
    name: str
    expression: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.name, F.expr(self.expression))


@dataclass(frozen=True)
class Join:
    other: object  # a source
    on: str  # SQL join condition
    how: str = "inner"
    broadcast: bool = False

    def apply(self, df: DataFrame) -> DataFrame:
        right = self.other.read(df.sparkSession)
        if self.broadcast:
            right = F.broadcast(right)
        return df.join(right, F.expr(self.on), self.how)


@dataclass(frozen=True)
class Aggregate:
    by: list[str]
    aggs: dict[str, str]  # alias -> SQL aggregate expression

    def apply(self, df: DataFrame) -> DataFrame:
        exprs = [F.expr(e).alias(a) for a, e in self.aggs.items()]
        return df.groupBy(*[F.expr(b) for b in self.by]).agg(*exprs)


@dataclass(frozen=True)
class Explode:
    array_expression: str
    alias: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.withColumn(self.alias, F.explode(F.expr(self.array_expression)))


@dataclass(frozen=True)
class FlatMapPandas:
    """Opaque per-record transform (the swallow `doc -> list[doc]` escape
    hatch), Arrow-batched. fn: iterator[pd.DataFrame] -> iterator[pd.DataFrame].
    """

    fn: Callable
    schema: str

    def apply(self, df: DataFrame) -> DataFrame:
        return df.mapInPandas(self.fn, self.schema)


@dataclass(frozen=True)
class Quarantine:
    """Transform-time error routing (swallow's skip-bad-record analog,
    SURVEY.md §1.2): rows failing `valid_predicate` are written to
    `quarantine_path` (with a reason column) and removed from the stream.

    Scale note: one pass — Spark computes the predicate once per row; the
    quarantine write is a separate action on the filtered branch, so keep the
    predicate cheap or cache upstream when the branch is expensive.
    """

    valid_predicate: str
    quarantine_path: str
    reason: str = "failed_validation"

    def apply(self, df: DataFrame) -> DataFrame:
        bad = df.filter(~F.expr(self.valid_predicate)).withColumn(
            "_quarantine_reason", F.lit(self.reason)
        )
        bad.write.mode("overwrite").parquet(self.quarantine_path)
        return df.filter(F.expr(self.valid_predicate))


@dataclass(frozen=True)
class Repartition:
    num: int | None = None
    by: tuple = ()

    def apply(self, df: DataFrame) -> DataFrame:
        cols = [F.col(c) for c in self.by]
        if self.num is None:
            return df.repartition(*cols)
        return df.repartition(self.num, *cols) if cols else df.repartition(self.num)


@dataclass(frozen=True)
class Dedup:
    """Keep exactly one row per key, chosen by a deterministic order —
    the facade's exact-dedup verb (swallow's unique-by analog).

    Scale note: compiles to row_number over (key, order) — one shuffle on
    the key; for pure whole-row dedup prefer the cheaper distinct().
    """

    by: tuple  # key expressions
    order_by: tuple  # total-order tiebreak expressions (ascending)

    def apply(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.window import Window

        w = Window.partitionBy(*[F.expr(b) for b in self.by]).orderBy(
            *[F.expr(o) for o in self.order_by]
        )
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )


@dataclass(frozen=True)
class Sample:
    """Deterministic key-hash percentage sample (rerun- and
    partition-stable, unlike df.sample) — the facade's corpus-sampling
    verb. `key` must be an integer SQL expression."""

    key: str
    percent: int  # keep rows where hash(key) mod 100 < percent

    def apply(self, df: DataFrame) -> DataFrame:
        # BIGINT cast up front: an INT32 key would overflow at the
        # * 1103515245 step in both engines (ANSI Spark throws)
        h = (
            f"pmod(pmod(pmod(CAST({self.key} AS BIGINT), 1000003)"
            f" * 1103515245, 1000003), 100)"
        )
        return df.filter(F.expr(f"{h} < {self.percent}"))

    def sql(self) -> str:
        """The identical predicate in DuckDB spelling. DuckDB's % returns
        NEGATIVE remainders for negative keys (Spark's pmod never does), so
        the innermost mod is spelled ((x % m + m) % m); every later operand
        is then non-negative, where % ≡ pmod."""
        h0 = f"((CAST({self.key} AS BIGINT) % 1000003 + 1000003) % 1000003)"
        h = f"(({h0} * 1103515245) % 1000003) % 100"
        return f"{h} < {self.percent}"


@dataclass(frozen=True)
class Union:
    """Append another source's rows by column name (swallow's multi-source
    concat)."""

    other: object

    def apply(self, df: DataFrame) -> DataFrame:
        return df.unionByName(self.other.read(df.sparkSession))


# ----------------------------------------------------------------- sinks


@dataclass(frozen=True)
class ParquetSink:
    path: str
    partition_by: tuple = ()
    mode: str = "overwrite"

    def write(self, df: DataFrame) -> None:
        w = df.write.mode(self.mode)
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.parquet(self.path)


# -------------------------------------------------------------- pipeline


@dataclass(frozen=True)
class Pipeline:
    source: object
    steps: Iterable[object] = ()
    sink: object = None

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Build the full declarative plan without executing it."""
        df = self.source.read(spark)
        for step in self.steps:
            df = step.apply(df)
        return df

    def run(self, spark: SparkSession) -> DataFrame:
        """Execute: write to the sink if present, return the final DataFrame."""
        df = self.to_df(spark)
        if self.sink is not None:
            self.sink.write(df)
        return df
