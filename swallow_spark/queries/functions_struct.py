"""Struct-type columns + late string-function additions."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register


@register(
    "fn_string_extra",
    oracle="""
SELECT p_partkey,
       split_part(p_name, ' ', 1) AS adjective,
       split_part(p_name, ' ', 2) AS noun,
       CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels,
       array_to_string(regexp_extract_all(p_name, '[a-z]+'), '|') AS words
FROM part
""",
    tier="T2",
)
def fn_string_extra(spark, sf_dir):
    """split_part + regexp_extract_all (scalar and array-returning regex)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(1)).alias("adjective"),
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)).alias("noun"),
        # idx=0 = whole match (Spark defaults to capture group 1; DuckDB
        # defaults to group 0 — align explicitly)
        F.size(F.regexp_extract_all(F.col("p_name"), F.lit("[aeiou]"), F.lit(0)))
        .cast("long")
        .alias("n_vowels"),
        F.array_join(
            F.regexp_extract_all(F.col("p_name"), F.lit("[a-z]+"), F.lit(0)), "|"
        ).alias("words"),
    )


@register("fn_struct", oracle=None, tier="T3")
def fn_struct(spark, sf_dir):
    """Struct pack (rows-only: struct output hashing is engine-awkward, like
    fn_map): named_struct creation, field access, nested structs, struct in
    arrays — the shape multimodal records use."""
    d = load(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("chars"),
        F.struct(F.col("source").alias("name"), F.lit("v1").alias("version")).alias(
            "origin"
        ),
    )
    return d.select(
        "doc_id",
        meta.alias("meta"),
        meta.getField("origin").getField("name").alias("origin_name"),
        F.array(meta, meta).alias("meta_pair"),
        F.size(F.array(meta)).cast("long").alias("n_metas"),
    )
