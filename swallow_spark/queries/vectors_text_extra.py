"""Embedding aggregation + language-model-style text scoring.

- vec_centroids_per_label: element-wise mean embedding per label (the
  centroid table an IVF index / classifier trains on), exact integer-unit
  sums so every element is reproducible at any partitioning.
- text_unigram_logprob: corpus-unigram log-probability per document — the
  perplexity-proxy quality filter used on pre-training corpora.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "vec_centroids_per_label",
    oracle=f"""
WITH ex AS (
  SELECT label, g.i AS i,
         CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 10000 + 0.5) AS BIGINT) AS u
  FROM embeddings,
       LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
)
SELECT label, CAST(i - 1 AS INT) AS dim,
       {sql_rnd('CAST(SUM(u) AS DOUBLE) / 10000 / COUNT(*)', 4)} AS mv,
       COUNT(*) AS n_vecs
FROM ex GROUP BY label, i
""",
    tier="T2",
)
def vec_centroids_per_label(spark, sf_dir):
    """Element-wise mean embedding per label from exact integer-unit sums,
    emitted as exploded scalar rows (label, dim, mv) — the driver's
    canonicalizer rejects array-typed output columns, and scalar doubles
    hash bit-identically where a float→string serialization would not.

    Scale note: posexplode → one partial+final aggregate keyed (label, dim);
    the resulting centroid table is tiny and broadcastable downstream
    (reassemble with collect_list over dim order if a caller wants vectors).
    """
    e = load(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding")).alias("pos", "x")
    ).select(
        "label",
        "pos",
        F.floor(F.col("x").cast("double") * 10000 + F.lit(0.5)).alias("u"),
    )
    return ex.groupBy("label", "pos").agg(
        rnd(F.sum("u").cast("double") / 10000 / F.count(F.lit(1)), 4).alias("mv"),
        F.count(F.lit(1)).alias("n_vecs"),
    ).select(
        "label", F.col("pos").cast("int").alias("dim"), "mv", "n_vecs"
    )


@register(
    "text_unigram_logprob",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tok),
freq AS (
  SELECT token,
         CAST(FLOOR(ln(CAST(COUNT(*) AS DOUBLE) / (SELECT total FROM n)) * 1000000)
              AS BIGINT) AS lp_units
  FROM tok GROUP BY token
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       {sql_rnd('CAST(SUM(f.lp_units) AS DOUBLE) / 1000000 / COUNT(*)', 4)} AS avg_logprob
FROM tok t JOIN freq f USING (token)
GROUP BY t.doc_id
""",
    tier="T2",
)
def text_unigram_logprob(spark, sf_dir):
    """Per-doc average unigram log-probability under the corpus's own
    unigram LM (perplexity-proxy quality score; low = out-of-distribution).

    Log-probs are quantized to integer 1e-6 units BEFORE summation so the
    per-doc sum is exact and order-independent — the same conform trick,
    applied to an LM score. Scale note: the freq table is vocabulary-sized
    and broadcast.
    """
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    n = tok.agg(F.count(F.lit(1)).alias("total"))
    freq = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .select(
            "token",
            F.floor(
                F.log(F.col("cnt").cast("double") / F.col("total")) * 1000000
            ).alias("lp_units"),
        )
    )
    return (
        tok.join(F.broadcast(freq), "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            rnd(
                F.sum("lp_units").cast("double") / 1000000 / F.count(F.lit(1)), 4
            ).alias("avg_logprob"),
        )
    )


@register(
    "vec_quantize_int8",
    oracle=f"""
WITH q AS (
  SELECT vec_id,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127 AS scale,
         embedding
  FROM embeddings
),
qq AS (
  SELECT vec_id, scale,
         list_transform(embedding,
           x -> CAST(FLOOR(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT)) AS iq
  FROM q WHERE scale > 0
)
SELECT vec_id,
       {sql_rnd('scale', 6)} AS scale,
       CAST(list_sum(list_transform(iq, v -> abs(v))) AS BIGINT) AS sum_abs_q,
       CAST(list_max(iq) AS BIGINT) AS max_q,
       CAST(list_min(iq) AS BIGINT) AS min_q
FROM qq
""",
    tier="T2",
)
def vec_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization (the storage/serving compression
    path for a 100 TB vector corpus): per-vector scale = max|x|/127, elements
    mapped to floor(x/scale + 0.5) ∈ [-127, 127]. Output summarizes each
    quantized vector with exact integers (Σ|q|, max, min) plus the rounded
    scale, so the check is deterministic — no float-sum order dependence.

    All JVM codegen (transform/aggregate lambdas); one scan, zero shuffles —
    embarrassingly parallel at any scale.
    """
    e = load(spark, sf_dir, "embeddings")
    absd = F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    scale = F.array_max(absd) / F.lit(127.0)
    q = e.select("vec_id", scale.alias("scale"), "embedding").filter(
        F.col("scale") > 0
    )
    iq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") / F.col("scale") + F.lit(0.5)),
    )
    qq = q.select("vec_id", "scale", iq.alias("iq"))
    sum_abs = F.aggregate(
        F.transform(F.col("iq"), lambda v: F.abs(v)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return qq.select(
        "vec_id",
        rnd(F.col("scale"), 6).alias("scale"),
        sum_abs.cast("long").alias("sum_abs_q"),
        F.array_max("iq").cast("long").alias("max_q"),
        F.array_min("iq").cast("long").alias("min_q"),
    )
