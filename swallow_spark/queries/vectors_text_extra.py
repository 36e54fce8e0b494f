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
