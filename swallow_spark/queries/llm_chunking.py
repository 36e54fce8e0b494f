"""LLM training-data preparation: context-window chunking with overlap,
sequence packing into fixed token budgets, and class-weight tables — the
steps between a cleaned corpus (training_data_clean) and a tokenizer-ready
dataset.

Determinism: token counts are exact ints (split-on-space, the same recipe
as llm_text); bin ids use pure integer arithmetic (DIV / ceil-as-int); the
only float anywhere is one final division for class weights.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..io import load
from ..ops.text import tokens
from ..registry import register

_WIN, _STRIDE, _BUDGET = 50, 40, 1000


@register(
    "doc_chunk_overlap",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, len(toks), {_STRIDE})) AS start
  FROM t
)
SELECT doc_id, (start - 1) // {_STRIDE} AS chunk_id,
       len(toks[start:start + {_WIN - 1}]) AS n_tok,
       array_to_string(toks[start:start + {_WIN - 1}], ' ') AS chunk_text
FROM s
""",
    tier="T2",
)
def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window chunking: {window}=50-token chunks every {stride}=40
    tokens (10-token overlap so no sentence is lost at a boundary) — the
    canonical context-window splitter before tokenization. slice() is
    1-based and end-clamped in both engines, so ragged tails agree.

    Scale note: chunking is generate-and-explode — no shuffle at all; each
    input row fans out to ceil(n/stride) rows inside the same task. The
    token array is materialized once per doc (not once per chunk) because
    slice() runs on the bound column, not inside a per-chunk lambda
    (the Catalyst lambda-hoisting trap).
    """
    d = load(spark, sf_dir, "documents").select("doc_id", tokens(F.col("text")).alias("toks"))
    s = d.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(1), F.size("toks"), F.lit(_STRIDE))).alias("start"),
    )
    chunk = F.slice(F.col("toks"), F.col("start"), _WIN)
    return s.select(
        "doc_id",
        F.expr(f"(start - 1) DIV {_STRIDE}").alias("chunk_id"),
        F.size(chunk).cast("bigint").alias("n_tok"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@register(
    "doc_pack_bins",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tok FROM documents
), c AS (
  SELECT lang, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT lang, CAST((cum + {_BUDGET - 1}) // {_BUDGET} AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS tot_tok
FROM c GROUP BY lang, bin
""",
    tier="T2",
)
def doc_pack_bins(spark, sf_dir):
    """Sequence packing: stream each language's docs (doc_id order) into
    ~{budget}=1000-token bins via running-cumsum // budget — the next-fit
    packer that turns ragged documents into fixed-budget training sequences
    without a stateful loop. Bin ids are pure integer arithmetic
    (ceil(cum/B) as (cum+B-1) DIV B), bit-identical across engines.

    Scale note: one shuffle on lang for the running sum, then a map-side
    re-aggregation on (lang, bin) — bin is monotone in doc_id so the
    second groupBy needs no extra exchange under AQE. For true first-fit
    (reset on overflow) swap the window for the aggregate()-fold recipe
    (ts_ewma); next-fit is what large-scale packers actually ship.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(tokens(F.col("text"))).alias("n_tok")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    return (
        c.withColumn("bin", F.expr(f"(cum + {_BUDGET - 1}) DIV {_BUDGET}"))
        .groupBy("lang", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tot_tok"),
        )
    )


@register(
    "class_weights",
    oracle="""
WITH c AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang)
SELECT lang, cnt,
       CAST(SUM(cnt) OVER () AS DOUBLE)
         / (COUNT(*) OVER () * cnt) AS weight
FROM c
""",
    tier="T2",
)
def class_weights(spark, sf_dir):
    """Balanced class weights w_c = N / (K * n_c) per language — the
    sampling/loss-weight table that rebalances a skewed corpus mix. One
    exact-integer division, so the doubles are bit-identical.

    Scale note: the window runs over the K-row post-aggregate, not the
    corpus; at 100 TB this is an aggregate + a 5-row broadcast.
    """
    d = load(spark, sf_dir, "documents")
    c = d.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy()
    return c.select(
        "lang",
        "cnt",
        (
            F.sum("cnt").over(w).cast("double") / (F.count(F.lit(1)).over(w) * F.col("cnt"))
        ).alias("weight"),
    )


_CURR_SQL = """
WITH t AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tok,
         len(list_distinct(string_split(text, ' '))) AS n_dis
  FROM documents WHERE text IS NOT NULL AND len(string_split(text, ' ')) > 0
),
q AS (
  SELECT doc_id, lang, n_tok,
         n_dis * 1000000 // n_tok AS quality_micro
  FROM t
),
r AS (
  SELECT lang, n_tok, quality_micro,
         row_number() OVER (PARTITION BY lang
                            ORDER BY quality_micro DESC, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM q
)
SELECT lang, CAST(3 * (rk - 1) // n AS BIGINT) AS phase,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS tot_tok,
       (FLOOR(CAST(SUM(quality_micro) AS DOUBLE) / COUNT(*) / 1000000 * 10000 + 0.5)
        / 10000) AS avg_quality
FROM r
GROUP BY lang, phase
"""


@register("doc_curriculum_order", oracle=_CURR_SQL, tier="T2")
def doc_curriculum_order(spark, sf_dir):
    """Curriculum scheduling: rank each language's documents by a
    deterministic quality signal (distinct-token ratio in integer
    micro-units) and split into three equal phases — highest-quality
    first — reporting per-phase doc counts, token mass, and mean quality.
    The ordering a curriculum-learning data loader consumes.

    Determinism: quality is an integer floor-division; ranks carry a
    total tie-break; phase = 3·(rank−1) DIV count is pure int.

    Scale note: ranking is per-language (the window partition key), so no
    global sort; everything after the window is map-side combinable. At
    100 TB you would bucket the rank output by (lang, phase) for the
    loader to range-read.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    toks = F.split(F.col("text"), " ")
    t = d.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tok"),
        F.size(F.array_distinct(toks)).alias("n_dis"),
    ).filter(F.col("n_tok") > 0)
    q = t.select(
        "doc_id",
        "lang",
        "n_tok",
        F.expr("n_dis * 1000000 DIV n_tok").alias("quality_micro"),
    )
    wr = Window.partitionBy("lang").orderBy(F.col("quality_micro").desc(), "doc_id")
    wn = Window.partitionBy("lang")
    r = q.select(
        "lang",
        "n_tok",
        "quality_micro",
        F.row_number().over(wr).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    return r.groupBy("lang", F.expr("CAST(3 * (rk - 1) DIV n AS BIGINT)").alias("phase")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("tot_tok"),
        (
            F.floor(
                F.sum("quality_micro").cast("double")
                / F.count(F.lit(1))
                / 1000000
                * 10000
                + F.lit(0.5)
            )
            / 10000
        ).alias("avg_quality"),
    )
