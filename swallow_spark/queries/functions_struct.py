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


@register(
    "fn_struct",
    oracle="""
SELECT doc_id,
       s.lang AS meta_lang,
       s.chars AS meta_chars,
       s.origin.name AS origin_name,
       s.origin.version AS origin_version,
       array_to_string(list_transform([s, s], x -> x.origin.name), '|') AS pair_origins,
       CAST(len([s, s]) AS BIGINT) AS n_metas
FROM (
    SELECT doc_id,
           struct_pack(lang := lang, chars := n_chars,
                       origin := struct_pack(name := source, version := 'v1')) AS s
    FROM documents
)
""",
    tier="T2",
)
def fn_struct(spark, sf_dir):
    """Struct build/access: named_struct creation, field access, nested
    structs, struct-in-array lambda projection — the shape multimodal records
    use. The struct lives *inside* the query; the declared output is flat
    scalars (struct fields projected, arrays '|'-joined) per the round-1
    scalar-only output contract."""
    d = load(spark, sf_dir, "documents")
    meta = F.struct(
        F.col("lang").alias("lang"),
        F.col("n_chars").alias("chars"),
        F.struct(F.col("source").alias("name"), F.lit("v1").alias("version")).alias(
            "origin"
        ),
    )
    pair = F.array(meta, meta)
    return d.select(
        "doc_id",
        meta.getField("lang").alias("meta_lang"),
        meta.getField("chars").alias("meta_chars"),
        meta.getField("origin").getField("name").alias("origin_name"),
        meta.getField("origin").getField("version").alias("origin_version"),
        F.array_join(
            F.transform(pair, lambda x: x.getField("origin").getField("name")), "|"
        ).alias("pair_origins"),
        F.size(pair).cast("long").alias("n_metas"),
    )
