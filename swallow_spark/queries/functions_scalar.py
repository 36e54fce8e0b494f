"""§2.H — scalar function packs: string, regex, distance, datetime, math,
null-handling, JSON, hash, casts. One key per family; each key emits several
computed columns over a keyed projection so the hash checks the whole family.

Cross-engine notes baked into the SQL:
- length/instr/levenshtein/year(...) return INT in Spark vs BIGINT in DuckDB
  → cast to BIGINT on both sides.
- DuckDB regexp_replace is first-match unless the 'g' flag is given; Spark
  replaces all — oracle uses 'g'.
- double→string formatting differs between engines; never cast floats to
  strings (date→string is safe).
- exp/ln/log10 are libm-dependent; rounded to 4dp (conform.rnd) and
  parity-verified by tools/oracle_diff before declaration.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "fn_string",
    oracle="""
SELECT p_partkey,
       concat_ws(' ', p_name, p_brand) AS full_name,
       upper(p_name) AS up, lower(p_type) AS lo,
       substring(p_name, 1, 5) AS sub5,
       lpad(p_brand, 10, '*') AS padded,
       rpad(p_type, 10, '.') AS rpadded,
       CAST(length(p_name) AS BIGINT) AS name_len,
       replace(p_name, 'a', '@') AS repl,
       string_split(p_name, ' ')[1] AS first_word,
       translate(p_name, 'aeiou', '12345') AS trans,
       reverse(p_name) AS rev,
       CAST(instr(p_name, 'e') AS BIGINT) AS pos_e,
       trim('  ' || p_name || '  ') AS trimmed
FROM part
""",
    tier="T1",
)
def fn_string(spark, sf_dir):
    """String pack: concat/case/substr/pad/len/replace/split/translate/
    reverse/instr/trim."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws(" ", "p_name", "p_brand").alias("full_name"),
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.lpad("p_brand", 10, "*").alias("padded"),
        F.rpad("p_type", 10, ".").alias("rpadded"),
        F.length("p_name").cast("long").alias("name_len"),
        F.replace(F.col("p_name"), F.lit("a"), F.lit("@")).alias("repl"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.translate("p_name", "aeiou", "12345").alias("trans"),
        F.reverse("p_name").alias("rev"),
        F.instr("p_name", "e").cast("long").alias("pos_e"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
    )


@register(
    "fn_string_regex",
    oracle="""
SELECT p_partkey,
       regexp_extract(p_name, '^([a-z]+) ', 1) AS first_token,
       regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_masked,
       CAST(regexp_matches(p_name, '(bolt|gear)$') AS INT) AS is_hardware
FROM part
""",
    tier="T2",
)
def fn_string_regex(spark, sf_dir):
    """Conservative (RE2-compatible) regex pack: extract group / replace-all /
    match flag."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.regexp_extract("p_name", r"^([a-z]+) ", 1).alias("first_token"),
        F.regexp_replace("p_brand", "[0-9]+", "#").alias("brand_masked"),
        F.col("p_name").rlike("(bolt|gear)$").cast("int").alias("is_hardware"),
    )


@register(
    "fn_string_distance",
    oracle="""
SELECT c_custkey,
       CAST(levenshtein(c_name, 'Customer#000000000') AS BIGINT) AS dist_zero,
       CAST(levenshtein(c_mktsegment, 'MACHINERY') AS BIGINT) AS dist_seg
FROM customer
""",
    tier="T2",
)
def fn_string_distance(spark, sf_dir):
    """Bounded Levenshtein distances (fuzzy-match building block)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.levenshtein("c_name", F.lit("Customer#000000000")).cast("long").alias("dist_zero"),
        F.levenshtein("c_mktsegment", F.lit("MACHINERY")).cast("long").alias("dist_seg"),
    )


@register(
    "fn_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mo,
       CAST(day(o_orderdate) AS BIGINT) AS dy,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate AS DATE) + 30 AS plus30,
       CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS epoch_days,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       epoch_us(o_orderdate) AS epoch_micro
FROM orders
""",
    tier="T1",
)
def fn_datetime(spark, sf_dir):
    """Datetime pack: extracts, trunc, date arithmetic, epoch (UTC pinned)."""
    o = load(spark, sf_dir, "orders")
    d = F.to_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(d, F.lit("1970-01-01")).cast("long").alias("epoch_days"),
        F.last_day(d).alias("month_end"),
        # parquet ms-timestamps surface as TIMESTAMP_NTZ; cast is identity
        # under the pinned UTC session but required by unix_micros
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("epoch_micro"),
    )


@register(
    "fn_math",
    oracle=f"""
SELECT p_partkey,
       {sql_rnd('sqrt(p_retailprice)', 4)} AS sq,
       {sql_rnd('exp(p_size / 10.0)', 4)} AS ex,
       {sql_rnd('ln(p_retailprice)', 4)} AS lg,
       {sql_rnd('log10(p_retailprice)', 4)} AS l10,
       {sql_rnd('pow(p_size, 2)', 4)} AS pw,
       {sql_rnd('abs(p_retailprice - 1000)', 2)} AS ab,
       CAST(FLOOR(p_retailprice) AS BIGINT) AS fl,
       CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
       CAST(sign(p_retailprice - 1000) AS INT) AS sg,
       greatest(p_size, 25) AS gr,
       least(p_size, 25) AS le,
       p_partkey % 7 AS md
FROM part
""",
    tier="T1",
)
def fn_math(spark, sf_dir):
    """Math pack (transcendentals rounded to 4dp for cross-engine parity)."""
    p = load(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        rnd(F.sqrt(price), 4).alias("sq"),
        rnd(F.exp(F.col("p_size") / 10.0), 4).alias("ex"),
        rnd(F.log(price), 4).alias("lg"),
        rnd(F.log10(price), 4).alias("l10"),
        rnd(F.pow(F.col("p_size"), 2), 4).alias("pw"),
        rnd(F.abs(price - 1000), 2).alias("ab"),
        F.floor(price).alias("fl"),
        F.ceil(price).alias("ce"),
        F.signum(price - 1000).cast("int").alias("sg"),
        F.greatest(F.col("p_size"), F.lit(25)).alias("gr"),
        F.least(F.col("p_size"), F.lit(25)).alias("le"),
        (F.col("p_partkey") % 7).alias("md"),
    )


@register(
    "fn_null",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS status_or_null,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'was_p') AS status_filled,
       CAST(NULLIF(o_orderstatus, 'P') IS NULL AS INT) AS was_p_flag,
       CASE WHEN NULLIF(o_orderstatus, 'P') IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_style
FROM orders
""",
    tier="T1",
)
def fn_null(spark, sf_dir):
    """Null-handling pack: nullif / coalesce / null flags / nvl2 via CASE."""
    o = load(spark, sf_dir, "orders")
    s_or_n = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        s_or_n.alias("status_or_null"),
        F.coalesce(s_or_n, F.lit("was_p")).alias("status_filled"),
        s_or_n.isNull().cast("int").alias("was_p_flag"),
        F.when(s_or_n.isNotNull(), "has").otherwise("none").alias("nvl2_style"),
    )


@register(
    "fn_json",
    oracle="""
WITH ev AS (
  SELECT event_id,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN props END AS props
  FROM events
)
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k1,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k2,
       CAST(json_extract_string(props, '$.k') IS NOT NULL AS INT) AS has_k,
       CAST(json_extract_string(props, '$.missing') AS BIGINT) AS k_missing
FROM ev
""",
    tier="T1",
)
def fn_json(spark, sf_dir):
    """JSON pack: path extraction (two routes in Spark: get_json_object and
    from_json→field; both must agree with the oracle), missing-path → NULL.
    Malformed JSON → NULL on both engines: Spark's get_json_object /
    PERMISSIVE from_json return NULL for truncated documents (probed —
    Jackson does NOT surface prefix values), while DuckDB's
    json_extract_string hard-errors, so the oracle pre-guards with
    json_valid (the props-JSON drift probe rule)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k1"),
        F.from_json("props", "k long").getField("k").alias("k2"),
        F.get_json_object("props", "$.k").isNotNull().cast("int").alias("has_k"),
        F.get_json_object("props", "$.missing").cast("long").alias("k_missing"),
    )


@register(
    "fn_hash",
    oracle="""
SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256
FROM documents
""",
    tier="T2",
)
def fn_hash(spark, sf_dir):
    """Content hashes (hex strings) — the dedup_exact building block."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
    )


@register(
    "fn_conv_cast",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_int,
       CAST(l_orderkey AS VARCHAR) AS key_str,
       CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS ship_day_str,
       CAST(l_linenumber AS DOUBLE) AS line_dbl,
       epoch_us(l_shipdate) AS ship_epoch_us,
       CAST('42.5' AS DOUBLE) AS str_num
FROM lineitem
""",
    tier="T1",
)
def fn_conv_cast(spark, sf_dir):
    """Cast pack across int/double/string/date/epoch (float→string avoided:
    engine formatting differs; floor before float→int: truncation semantics
    differ)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.floor("l_quantity").alias("qty_int"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_shipdate").cast("date").cast("string").alias("ship_day_str"),
        F.col("l_linenumber").cast("double").alias("line_dbl"),
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("ship_epoch_us"),
        F.lit("42.5").cast("double").alias("str_num"),
    )


_COLLATION_SQL = """
WITH m AS (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg
  FROM customer
)
SELECT lower(seg) AS segment, CAST(COUNT(*) AS BIGINT) AS n
FROM m GROUP BY lower(seg)
"""


@register("fn_collation_ci", oracle=_COLLATION_SQL, tier="T2")
def fn_collation_ci(spark, sf_dir):
    """Case-insensitive COLLATION grouping (Spark 4 collation support):
    segment labels are deterministically case-mangled (even keys upper,
    odd keys lower), then grouped under `COLLATE UTF8_LCASE` — the engine
    merges case variants natively instead of via an explicit lower()
    projection. The emitted group label is lower()ed so the
    representative-row choice (partition-order dependent under collation
    grouping) never reaches the output; the DuckDB oracle groups by
    lower() directly — the hash match proves the collation path merges
    exactly the same groups.
    """
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("collate_customer")
    return spark.sql(
        """
        WITH m AS (
          SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                      ELSE lower(c_mktsegment) END AS seg
          FROM collate_customer
        )
        SELECT lower(seg COLLATE UTF8_LCASE) AS segment, COUNT(*) AS n
        FROM m GROUP BY seg COLLATE UTF8_LCASE
        """
    )
