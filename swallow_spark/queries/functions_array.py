"""§2.H — array / higher-order / map / explode packs.

Determinism: float reductions over arrays are canonicalized to integer units
inside the lambda (sum of longs is order-independent) — see fn_array_lambda.
DuckDB list indexing is 1-based like Spark's element_at/slice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "fn_array",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(list_contains(string_split(text, ' '), 'data') AS INT) AS has_data,
       array_to_string(list_slice(string_split(text, ' '), 1, 3), '|') AS first3,
       string_split(text, ' ')[2] AS second_token,
       CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq,
       array_to_string(list_sort(list_distinct(list_slice(string_split(text, ' '), 1, 5))), '|')
         AS first5_sorted
FROM documents
""",
    tier="T2",
)
def fn_array(spark, sf_dir):
    """Array pack: size/contains/slice/element_at/distinct/sort over token
    arrays. Array results are serialized with array_join('|') — the driver's
    canonicalizer rejects non-scalar output columns (VERDICT r1 contract)."""
    d = load(spark, sf_dir, "documents")
    arr = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(arr).cast("long").alias("n_tokens"),
        F.array_contains(arr, "data").cast("int").alias("has_data"),
        F.array_join(F.slice(arr, 1, 3), "|").alias("first3"),
        # try_element_at: a 1-token doc must yield NULL like DuckDB's [2],
        # not an ANSI INVALID_ARRAY_INDEX crash (testdata-drift hardening)
        F.try_element_at(arr, F.lit(2)).alias("second_token"),
        F.size(F.array_distinct(arr)).cast("long").alias("n_uniq"),
        F.array_join(F.sort_array(F.array_distinct(F.slice(arr, 1, 5))), "|").alias(
            "first5_sorted"
        ),
    )


@register(
    "fn_array_lambda",
    oracle=f"""
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
       CAST(len(list_filter(embedding, x -> abs(x) > 1.0)) AS BIGINT) AS n_big,
       {sql_rnd("sqrt(CAST(list_sum(list_transform(embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 100000000 + 0.5) AS BIGINT))) AS DOUBLE) / 100000000)", 4)} AS l2_norm
FROM embeddings
""",
    tier="T2",
)
def fn_array_lambda(spark, sf_dir):
    """Higher-order pack: filter/transform/aggregate over embeddings.

    L2 norm sums integer 1e-8 units (exact longs) so the reduction is
    order-independent — the same trick conform.money_sum uses, applied inside
    a lambda. Scale note: stays entirely in JVM codegen, no UDF.
    """
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    sq_units = F.aggregate(
        emb,
        F.lit(0).cast("long"),
        lambda acc, x: acc
        + F.floor(x.cast("double") * x.cast("double") * F.lit(100000000) + F.lit(0.5)),
    )
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_pos"),
        F.size(F.filter(emb, lambda x: F.abs(x) > 1.0)).cast("long").alias("n_big"),
        rnd(F.sqrt(sq_units.cast("double") / F.lit(100000000)), 4).alias("l2_norm"),
    )


@register(
    "fn_explode",
    oracle="""
SELECT doc_id, CAST(g.i - 1 AS INT) AS pos, t.arr[g.i] AS token
FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM documents) t,
     LATERAL (SELECT unnest(generate_series(1, len(t.arr))) AS i) g
""",
    tier="T2",
)
def fn_explode(spark, sf_dir):
    """posexplode of token arrays → (doc_id, pos, token) rows.

    Scale note: explode multiplies rows; keep the projection minimal before
    exploding so the shuffle that follows carries only (id, token).
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "token")
    )


@register(
    "fn_map",
    oracle="""
WITH ev AS (
  SELECT event_id,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN props END AS props
  FROM events
)
SELECT event_id,
       'k' AS first_key,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(1 AS BIGINT) AS n_keys
FROM ev
""",
    tier="T2",
)
def fn_map(spark, sf_dir):
    """Map pack: create_map from JSON, keys/values/element_at lookup —
    exercised through the MapType API, then flattened to scalar columns
    (first key, looked-up value, key count) for driver hash parity (MAP
    columns are forbidden in declared outputs; VERDICT r1 item 8)."""
    e = load(spark, sf_dir, "events")
    m = F.create_map(F.lit("k"), F.get_json_object("props", "$.k").cast("long"))
    return e.select(
        "event_id",
        F.element_at(F.map_keys(m), 1).alias("first_key"),
        F.element_at(m, F.lit("k")).alias("k_val"),
        F.size(F.map_values(m)).cast("bigint").alias("n_keys"),
    )


@register(
    "fn_array_gen",
    oracle="""
SELECT o_orderkey,
       array_to_string(generate_series(1, o_orderkey % 5 + 2), '|') AS seq,
       array_to_string((generate_series(1, o_orderkey % 5 + 2))[2:4], '|') AS sliced,
       array_to_string(list_sort(list_distinct(flatten(
         [generate_series(1, o_orderkey % 5 + 2), [1, 2]]))), '|') AS flat_uniq,
       list_position(generate_series(1, o_orderkey % 5 + 2), 2) AS pos2
FROM orders WHERE o_orderkey % 97 = 0
""",
    tier="T2",
)
def fn_array_gen(spark, sf_dir):
    """Array generation/manipulation pack: sequence, slice, flatten +
    dedup (sorted for cross-engine order canonicalization), positional
    search. Spark slice(arr, 2, 3) == DuckDB 1-based inclusive arr[2:4];
    array_position and list_position agree (1-based) whenever the needle
    exists — the generated sequences always contain 2.

    Scale note: all whole-stage-codegen JVM expressions, no UDF, no
    shuffle; the %97 filter is pushed to the parquet scan.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    seq = F.sequence(F.lit(1), (F.col("o_orderkey") % 5 + 2).cast("int"))
    return o.select(
        "o_orderkey",
        F.array_join(seq.cast("array<string>"), "|").alias("seq"),
        F.array_join(F.slice(seq, 2, 3).cast("array<string>"), "|").alias("sliced"),
        F.array_join(
            F.array_sort(
                F.array_distinct(F.flatten(F.array(seq, F.array(F.lit(1), F.lit(2)))))
            ).cast("array<string>"),
            "|",
        ).alias("flat_uniq"),
        F.array_position(seq, 2).alias("pos2"),
    )


@register(
    "fn_zip_with",
    oracle="""
WITH t AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), w -> CAST(length(w) AS BIGINT))
           AS a
  FROM documents WHERE doc_id < 100
)
SELECT doc_id,
       CAST(len(a) AS BIGINT) AS n,
       CAST(list_sum(list_transform(generate_series(1, len(a)),
              i -> a[i] * a[len(a) - i + 1])) AS BIGINT) AS rev_dot,
       CAST(list_sum(list_transform(generate_series(1, len(a)),
              i -> greatest(a[i], a[len(a) - i + 1]))) AS BIGINT) AS max_sum
FROM t
""",
    tier="T2",
)
def fn_zip_with(spark, sf_dir):
    """zip_with (element-wise lambda over two arrays — the higher-order
    function the array family was missing): each doc's token-length array
    is zipped against its own reverse, computing the reversed dot product
    and the element-wise max sum — the array-pair arithmetic shape used
    for weighted dots, feature crossing, and vector blending without
    exploding. The oracle spells zip_with as an index transform over
    generate_series (DuckDB's list_zip produces structs; the index form
    is the portable spelling).

    Determinism: exact integer token lengths end to end. Scale note:
    zip_with is a single codegen expression per row — no Generate, no
    shuffle; the doc_id bound is pushed to the scan.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    t = d.select(
        "doc_id",
        F.expr("transform(split(text, ' '), w -> CAST(length(w) AS BIGINT))").alias("a"),
    )
    return t.select(
        "doc_id",
        F.size("a").cast("long").alias("n"),
        F.expr(
            "aggregate(zip_with(a, reverse(a), (x, y) -> x * y), 0L,"
            " (acc, v) -> acc + v)"
        )
        .cast("long")
        .alias("rev_dot"),
        F.expr(
            "aggregate(zip_with(a, reverse(a), (x, y) -> greatest(x, y)), 0L,"
            " (acc, v) -> acc + v)"
        )
        .cast("long")
        .alias("max_sum"),
    )
