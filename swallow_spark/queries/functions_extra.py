"""Late-wave additions: boolean aggregates and trigonometry pack."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import rnd, sql_rnd
from ..io import load
from ..registry import register


@register(
    "agg_bool",
    oracle="""
SELECT event_type,
       bool_and(value > 0) AS all_positive,
       bool_or(value > 400) AS any_large,
       CAST(SUM(CASE WHEN value > 400 THEN 1 ELSE 0 END) AS BIGINT) AS n_large
FROM events
GROUP BY event_type
""",
    tier="T2",
)
def agg_bool(spark, sf_dir):
    """Boolean aggregates: bool_and / bool_or per group."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.bool_and(F.col("value") > 0).alias("all_positive"),
        F.bool_or(F.col("value") > 400).alias("any_large"),
        F.sum(F.when(F.col("value") > 400, 1).otherwise(0)).cast("long").alias("n_large"),
    )


@register(
    "fn_trig",
    oracle=f"""
SELECT p_partkey,
       {sql_rnd('sin(p_size / 10.0)', 4)} AS sn,
       {sql_rnd('cos(p_size / 10.0)', 4)} AS cs,
       {sql_rnd('atan2(p_size, 10)', 4)} AS at2,
       {sql_rnd('degrees(atan2(p_size, 10))', 4)} AS at2_deg,
       {sql_rnd('pi()', 4)} AS pi_const
FROM part
""",
    tier="T2",
)
def fn_trig(spark, sf_dir):
    """Trig pack (libm results rounded to 4dp; parity-verified like exp/ln)."""
    p = load(spark, sf_dir, "part")
    x = F.col("p_size") / 10.0
    return p.select(
        "p_partkey",
        rnd(F.sin(x), 4).alias("sn"),
        rnd(F.cos(x), 4).alias("cs"),
        rnd(F.atan2(F.col("p_size").cast("double"), F.lit(10.0)), 4).alias("at2"),
        rnd(
            F.degrees(F.atan2(F.col("p_size").cast("double"), F.lit(10.0))), 4
        ).alias("at2_deg"),
        rnd(F.lit(3.141592653589793), 4).alias("pi_const"),
    )


@register(
    "fn_url",
    oracle="""
SELECT doc_id,
       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
       regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
       regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
FROM (SELECT doc_id,
             'https://' || source || '.example.com/doc/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang AS url
      FROM documents) t
""",
    tier="T2",
)
def fn_url(spark, sf_dir):
    """URL decomposition with parse_url (protocol / host / path / query
    param) over deterministically synthesized crawl-style URLs — the
    provenance-parsing step of a web-scale corpus pipeline. The oracle
    re-derives each part with anchored regexps that Java and RE2 interpret
    identically."""
    d = load(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/doc/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
    )
    return d.select(
        "doc_id",
        F.parse_url(url, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )


@register(
    "fn_try_arith",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice / NULLIF(l_quantity - 25, 0) AS price_per_excess,
       TRY_CAST(CASE WHEN l_orderkey % 2 = 0
                     THEN CAST(l_orderkey AS VARCHAR) ELSE 'n/a' END
                AS BIGINT) AS parsed_key
FROM lineitem
""",
    tier="T2",
)
def fn_try_arith(spark, sf_dir):
    """Error-safe arithmetic/parsing: try_divide yields NULL on division by
    zero (l_quantity == 25) and try_cast yields NULL on malformed input,
    instead of failing the job — how a 100 TB pipeline survives dirty rows
    without PERMISSIVE-mode re-reads. Oracle mirrors with NULLIF and
    TRY_CAST."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.lit(25)
        ).alias("price_per_excess"),
        F.expr(
            "try_cast(CASE WHEN l_orderkey % 2 = 0"
            " THEN CAST(l_orderkey AS STRING) ELSE 'n/a' END AS BIGINT)"
        ).alias("parsed_key"),
    )


@register(
    "fn_variant",
    oracle="""
WITH ev AS (
  SELECT event_id,
         CASE WHEN props IS NOT NULL AND json_valid(props)
              THEN props END AS props
  FROM events
)
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_bucket
FROM ev
""",
    tier="T2",
)
def fn_variant(spark, sf_dir):
    """Spark 4 VARIANT for semi-structured columns: parse_json gives a
    binary variant (shredded, no per-row re-parse) and variant_get extracts
    typed paths — the schema-on-read path for heterogeneous 100 TB event
    payloads, ~an order faster than string JSON extraction at scale.
    Oracle extracts the same path via DuckDB's JSON functions.
    try_parse_json (not parse_json) on the Spark side: malformed JSON must
    become a NULL variant, matching the oracle's json_valid pre-guard —
    plain parse_json throws on the truncated-document probe variant."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id", F.try_parse_json("props").alias("v")
    ).select(
        "event_id",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
        (F.expr("variant_get(v, '$.k', 'int')") % F.lit(10)).alias("k_bucket"),
    )


@register(
    "fn_xml",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders WHERE o_totalprice IS NOT NULL AND o_orderstatus IS NOT NULL
""",
    tier="T2",
)
def fn_xml(spark, sf_dir):
    """Spark 4 XML ingestion: rows serialized to an XML fragment, parsed
    back with from_xml into a typed struct — the adapter shape for
    XML-bearing sources. The oracle is the round-trip identity: parsed
    fields must equal the original columns exactly (Java double→string is
    shortest-exact, so the double survives the text round trip). NULL
    fields are excluded up front: concat() nulls the whole fragment, which
    is a serializer-side choice, not a round-trip property."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull() & F.col("o_orderstatus").isNotNull()
    )
    xml = F.concat(
        F.lit("<row><o_orderkey>"), F.col("o_orderkey"),
        F.lit("</o_orderkey><o_orderstatus>"), F.col("o_orderstatus"),
        F.lit("</o_orderstatus><o_totalprice>"), F.col("o_totalprice"),
        F.lit("</o_totalprice></row>"),
    )
    return (
        o.select(xml.alias("x"))
        .select(
            F.from_xml(
                "x", "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"
            ).alias("p")
        )
        .select("p.o_orderkey", "p.o_orderstatus", "p.o_totalprice")
    )


@register(
    "fn_array_setops",
    oracle="""
SELECT l_orderkey, l_linenumber,
       array_to_string(list_sort(list_distinct([l_orderkey % 7, l_partkey % 7, l_suppkey % 7]
                 || [l_partkey % 7, CAST(3 AS BIGINT)])), '|') AS u,
       COALESCE(array_to_string(list_sort(list_distinct(list_intersect(
           [l_orderkey % 7, l_partkey % 7, l_suppkey % 7],
           [l_partkey % 7, CAST(3 AS BIGINT)]))), '|'), '') AS i,
       COALESCE(array_to_string(list_sort(list_distinct(list_filter(
           [l_orderkey % 7, l_partkey % 7, l_suppkey % 7],
           x -> NOT list_contains([l_partkey % 7, CAST(3 AS BIGINT)], x)))), '|'), '')
         AS e
FROM lineitem
""",
    tier="T2",
)
def fn_array_setops(spark, sf_dir):
    """Array set algebra (union / intersect / except), canonicalized with
    distinct + sort on both engines so element order and duplicate policy
    can't differ. Arrays are derived from row keys, so every row exercises
    a different combination."""
    li = load(spark, sf_dir, "lineitem")
    a = F.array(
        F.col("l_orderkey") % 7, F.col("l_partkey") % 7, F.col("l_suppkey") % 7
    )
    b = F.array(F.col("l_partkey") % 7, F.lit(3).cast("bigint"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.array_join(F.sort_array(F.array_union(a, b)).cast("array<string>"), "|").alias("u"),
        F.array_join(F.sort_array(F.array_intersect(a, b)).cast("array<string>"), "|").alias("i"),
        F.array_join(F.sort_array(F.array_except(a, b)).cast("array<string>"), "|").alias("e"),
    )


@register(
    "fn_codec",
    oracle="""
SELECT doc_id,
       to_base64(encode(substring(text, 1, 14))) AS b64,
       hex(encode(text)) AS hx,
       decode(from_base64(to_base64(encode(text)))) = text AS roundtrip_ok
FROM documents
""",
    tier="T2",
)
def fn_codec(spark, sf_dir):
    """Binary codecs over text payloads: base64 / hex encode and a decode
    round-trip check — the wire-format plumbing for opaque binary columns
    (multimodal payload transport). Spark MIME-chunks base64 beyond 76
    output chars (inserting CRLF, which DuckDB never does), so the encoded
    comparison uses a 14-CHAR prefix — ≤ 56 UTF-8 bytes even if every char
    is 4-byte, under the 57-byte chunk threshold for ANY future testdata
    (the unicode drift probe caught the old 48-char cap chunking on CJK);
    the round-trip equality still covers the FULL text because unbase64
    accepts the chunked form."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.base64(F.substring("text", 1, 14).cast("binary")).alias("b64"),
        F.hex(F.col("text").cast("binary")).alias("hx"),
        (
            F.unbase64(F.base64(F.col("text").cast("binary"))).cast("string")
            == F.col("text")
        ).alias("roundtrip_ok"),
    )


# Synthetic but deterministic coordinates per nation — same arithmetic in
# both engines, so the trig inputs are bit-identical.
_LAT = "CAST((n_nationkey * 7) % 180 - 90 AS DOUBLE) + 0.5"
_LON = "CAST((n_nationkey * 13) % 360 - 180 AS DOUBLE) + 0.25"


@register(
    "fn_haversine",
    oracle=f"""
WITH pts AS (
  SELECT n_nationkey, n_name,
         radians({_LAT}) AS la, radians({_LON}) AS lo
  FROM nation
)
SELECT a.n_name AS from_nation, b.n_name AS to_nation,
       FLOOR(2 * 6371.0088 * asin(sqrt(
         pow(sin((b.la - a.la) / 2), 2)
         + cos(a.la) * cos(b.la) * pow(sin((b.lo - a.lo) / 2), 2)
       )) * 10 + 0.5) / 10 AS km
FROM pts a JOIN pts b ON a.n_nationkey < b.n_nationkey
""",
    tier="T2",
)
def fn_haversine(spark, sf_dir):
    """Great-circle (haversine) distance between synthesized nation
    coordinates, all 25×24/2 pairs, half-up rounded to 0.1 km.

    The geo primitive for location dedup / geofencing. The formula is
    written with the IDENTICAL operation sequence in both engines
    (radians → sin/cos → asin·2R); trig libs agree far beyond the 0.1 km
    canonicalization.

    Scale note: self-join on an inequality over a 25-row dim — broadcast
    nested loop is correct and tiny here. For billions of points, bucket by
    geohash prefix first (fn_zorder) so candidate pairs are co-located.
    """
    n = load(spark, sf_dir, "nation")
    pts = n.select(
        "n_nationkey",
        "n_name",
        F.radians(F.expr(_LAT)).alias("la"),
        F.radians(F.expr(_LON)).alias("lo"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    dist = (
        F.lit(2 * 6371.0088)
        * F.asin(
            F.sqrt(
                F.pow(F.sin((F.col("b.la") - F.col("a.la")) / 2), 2)
                + F.cos(F.col("a.la"))
                * F.cos(F.col("b.la"))
                * F.pow(F.sin((F.col("b.lo") - F.col("a.lo")) / 2), 2)
            )
        )
    )
    return a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey")).select(
        F.col("a.n_name").alias("from_nation"),
        F.col("b.n_name").alias("to_nation"),
        (F.floor(dist * 10 + F.lit(0.5)) / 10).alias("km"),
    )


# Portable day-of-week WITHOUT engine dow functions: Spark's dayofweek is
# 1=Sunday while DuckDB's is 0=Sunday — instead derive from exact epoch-day
# arithmetic (1970-01-01 was a THURSDAY): dow = (epoch_days + 4) % 7, 0=Sunday.
_BD_SPAN = 30  # business days counted in [o_orderdate, o_orderdate + 30d)


@register(
    "fn_business_days",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d0,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS e0
  FROM orders WHERE o_orderkey % 100 = 0
)
SELECT o_orderkey, d0 AS order_date,
       CAST(((e0 + 4) % 7 + 7) % 7 AS BIGINT) AS dow0_sun,
       CAST(len(list_filter(generate_series(e0, e0 + {_BD_SPAN} - 1),
                            e -> ((e + 4) % 7 + 7) % 7 NOT IN (0, 6)))
            AS BIGINT) AS business_days_30
FROM base
""",
    tier="T2",
)
def fn_business_days(spark, sf_dir):
    """Business-day calendar arithmetic on a 1%-sampled order set: the
    order date's day-of-week and the count of weekdays in the next 30
    days — WITHOUT either engine's dow function (Spark counts Sunday as
    1, DuckDB as 0; a silent off-by-one). Instead dow derives from exact
    epoch-day integer arithmetic (1970-01-01 = Thursday ⇒
    dow = (epoch_days + 4) mod 7, 0 = Sunday) — the portable-hash design
    rule applied to calendars.

    Scale note: map-only; the 30-element day list is generated in-row and
    never stored.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    base = o.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("d0"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01").cast("date")).alias(
            "e0"
        ),
    )
    return base.select(
        "o_orderkey",
        F.col("d0").alias("order_date"),
        (((F.col("e0") + 4) % 7 + 7) % 7).cast("long").alias("dow0_sun"),
        F.expr(
            f"CAST(size(filter(sequence(e0, e0 + {_BD_SPAN} - 1),"
            f" e -> ((e + 4) % 7 + 7) % 7 NOT IN (0, 6))) AS BIGINT)"
        ).alias("business_days_30"),
    )


@register(
    "fn_aes_roundtrip",
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(((octet_length(encode(o_orderpriority)) // 16) + 1) * 16 AS BIGINT)
         AS ct_bytes
FROM orders
GROUP BY o_orderpriority
""",
    tier="T2",
)
def fn_aes_roundtrip(spark, sf_dir):
    """Column-level encryption surface (aes_encrypt / aes_decrypt — the
    at-rest field-protection path for PII columns before they leave the
    cluster): each order's priority string is AES-128-ECB encrypted with a
    16-byte key, decrypted back, and the DECRYPTED value is the grouping
    key — so the aggregate only matches the oracle if every row survives
    the round trip byte-exact. ECB mode is used deliberately: it is the
    only deterministic mode (GCM/CBC salt a random IV per call, breaking
    both repeatability and group-by-on-ciphertext), which is exactly the
    classic determinism/security tradeoff tokenization systems document —
    noted here, not endorsed for production secrets.

    ct_bytes pins the PKCS#7 padding contract: ciphertext length is the
    plaintext length rounded UP to the next full 16-byte block (every
    priority is < 16 chars → one block). The oracle computes the same
    closed form from octet_length since DuckDB has no AES builtin.

    Scale note: aes_encrypt/decrypt are JVM codegen expressions — no UDF,
    no shuffle beyond the final aggregate.
    """
    o = load(spark, sf_dir, "orders")
    key = "swallow16bytekey"  # 16 bytes -> AES-128
    ct = F.expr(f"aes_encrypt(o_orderpriority, '{key}', 'ECB')")
    return (
        o.select(
            ct.alias("ct"),
        )
        .select(
            F.expr(f"CAST(aes_decrypt(ct, '{key}', 'ECB') AS STRING)").alias(
                "o_orderpriority"
            ),
            F.octet_length("ct").cast("long").alias("ct_bytes"),
        )
        .groupBy("o_orderpriority", "ct_bytes")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("o_orderpriority", "n", "ct_bytes")
    )


@register(
    "fn_stable_id",
    oracle="""
WITH h AS (
  SELECT doc_id, md5(concat('swallow:doc:', CAST(doc_id AS VARCHAR), ':',
                            text)) AS hx
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       concat(substr(hx, 1, 8), '-', substr(hx, 9, 4), '-',
              substr(hx, 13, 4), '-', substr(hx, 17, 4), '-',
              substr(hx, 21, 12)) AS stable_uuid
FROM h
""",
    tier="T2",
)
def fn_stable_id(spark, sf_dir):
    """Deterministic content-derived stable IDs (UUIDv5-style minting):
    md5 over a namespaced serialization of (doc_id, text), formatted in
    the canonical 8-4-4-4-12 UUID layout — the idempotent-ingest primitive
    (re-running the pipeline mints the SAME id, so downstream upserts
    dedupe for free; uuid() would mint a new row every run). The
    namespace prefix ('swallow:doc:') keeps IDs from colliding across
    entity types sharing a key space.

    Determinism: md5 is bit-identical in both engines over identical
    UTF-8 serializations; formatting is pure substring arithmetic. NULL
    text is excluded on both sides (concat(NULL) nulls the namespace in
    Spark but not DuckDB's concat, which skips NULLs — the one concat
    semantic the engines disagree on, worth pinning away explicitly).

    Scale note: map-only codegen — no shuffle; at 100 TB this runs at
    scan speed and the minted id becomes the shuffle/bucket key for
    everything downstream.
    """
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    hx = F.md5(
        F.concat(
            F.lit("swallow:doc:"),
            F.col("doc_id").cast("string"),
            F.lit(":"),
            F.col("text"),
        )
    )
    return d.select(
        "doc_id",
        F.concat_ws(
            "-",
            F.substring(hx, 1, 8),
            F.substring(hx, 9, 4),
            F.substring(hx, 13, 4),
            F.substring(hx, 17, 4),
            F.substring(hx, 21, 12),
        ).alias("stable_uuid"),
    )


@register(
    "fn_generators",
    oracle="""
WITH base AS (
  SELECT o_orderpriority AS prio,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY o_orderpriority
),
stacked AS (
  SELECT prio, 'n' AS k, n AS v FROM base
  UNION ALL SELECT prio, 'cents', cents FROM base
),
-- inline_outer over a CASE-null struct array: hot rows explode their
-- struct fields, cold rows survive as one NULL-field row
flagged AS (
  SELECT prio, k, v,
         CASE WHEN v > 1000 THEN 1 ELSE NULL END AS hot
  FROM stacked
)
SELECT prio, k, v,
       CASE WHEN hot IS NOT NULL THEN v * 2 END AS doubled,
       CASE WHEN hot IS NOT NULL THEN 'hot' END AS tag
FROM flagged
""",
    tier="T2",
)
def fn_generators(spark, sf_dir):
    """Generator-expression pack (SQL surfaces Spark groups under
    Generate): stack(n, ...) folds wide columns into rows WITHOUT the
    UNPIVOT clause (the expression-level spelling usable inside any
    SELECT), and inline_outer() explodes an array-of-structs while
    KEEPING rows whose array is NULL as a null-field row — the
    outer-generator semantics every nested-schema flattener depends on
    (plain inline would silently drop the cold rows). The oracle spells
    stack as UNION ALL and the outer-struct explode as CASE projections.

    Determinism: integer aggregates only; the generated struct carries
    (v*2, 'hot') so generated-vs-null fields are visible in the hash.
    Scale note: both generators are map-side Generate nodes over the
    5-row aggregate — fan-out costs rows, never a shuffle.
    """
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_generators")
    return spark.sql(
        """
        WITH base AS (
          SELECT o_orderpriority AS prio,
                 COUNT(*) AS n,
                 SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
          FROM orders_generators GROUP BY o_orderpriority
        ),
        stacked AS (
          SELECT prio, s.k, s.v
          FROM base
          LATERAL VIEW stack(2, 'n', n, 'cents', cents) s AS k, v
        )
        SELECT prio, k, v, gen.doubled, gen.tag
        FROM stacked
        LATERAL VIEW OUTER inline(
          CASE WHEN v > 1000
               THEN array(named_struct('doubled', v * 2, 'tag', 'hot'))
          END) gen AS doubled, tag
        """
    )


@register(
    "fn_mask_pii",
    oracle="""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(
         c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_name,
       CAST(length(c_name) AS BIGINT) AS n_chars
FROM customer WHERE c_custkey < 500
""",
    tier="T2",
)
def fn_mask_pii(spark, sf_dir):
    """Data-masking function surface (mask(), Spark 3.4+): customer names
    redacted to shape-preserving placeholders (uppercase→X, lowercase→x,
    digits→n, punctuation kept) — the display-layer PII control that
    keeps formats testable (length and structure survive, content
    doesn't; contrast etl_pseudonymize, which keeps JOINABILITY instead).
    The oracle spells the same masking as three character-class
    regexp_replace passes, pinning mask()'s default character table.

    Determinism: pure character mapping. Scale note: map-only codegen
    expression; the key bound is pushed to the scan.
    """
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    return c.select(
        "c_custkey",
        F.expr("mask(c_name)").alias("masked_name"),
        F.length("c_name").cast("long").alias("n_chars"),
    )


# ------------------------------------------------------------- soundex

_SDX_MAP = "01230120022455012623010202"  # A..Z; vowels+H/W/Y -> 0


def _collapse_runs(expr: str) -> str:
    """Collapse adjacent equal digits 1-6 WITHOUT regex backreferences
    (DuckDB's RE2 lacks them): three replace passes per digit halve any
    run each pass, so runs up to length 8 reduce to 1."""
    for d in "123456":
        for _ in range(3):
            expr = f"replace({expr}, '{d}{d}', '{d}')"
    return expr


_SDX_EXPR = (
    "substr(w, 1, 1) || substr(replace(substr("
    + _collapse_runs(f"translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ', '{_SDX_MAP}')")
    + ", 2), '0', '') || '000', 1, 3)"
)

_SOUNDEX_SQL = f"""
WITH words AS (
  SELECT upper(string_split(p_name, ' ')[1]) AS w
  FROM part WHERE p_name IS NOT NULL AND p_name <> ''
),
coded AS (
  SELECT w, {_SDX_EXPR} AS sdx FROM words
)
SELECT sdx,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT w) AS BIGINT) AS n_words,
       MIN(w) AS first_word
FROM coded
GROUP BY sdx
ORDER BY n_parts DESC, sdx
"""


@register("fn_soundex", oracle=_SOUNDEX_SQL, tier="T2")
def fn_soundex(spark, sf_dir):
    """Phonetic blocking via Soundex over the leading word of part names:
    letter→digit map, adjacent-duplicate collapse, vowel drop, pad to
    LETTER+3 — the classic fuzzy-matching blocking key (join on soundex,
    verify with edit distance — the join_fuzzy_blocked pattern with a
    phonetic block instead of a prefix block).

    Implemented as the SAME expression string in both engines (simplified
    variant: H/W break runs like vowels): translate() for the code map and
    a generated 18-deep replace() chain for run collapse — DuckDB's RE2
    regex has no backreferences, so `(\\d)\\1+` is unavailable; three
    halving passes per digit collapse any run ≤ 8. Spark's soundex()
    builtin implements the stricter H/W-transparent rule and is
    deliberately NOT used — the portable spelling is the point.

    Scale: map-only expression (pure codegen string ops) + one aggregate
    on the 4-char code.
    """
    p = load(spark, sf_dir, "part").filter(
        F.col("p_name").isNotNull() & (F.col("p_name") != "")
    )
    words = p.select(F.upper(F.split(F.col("p_name"), " ")[0]).alias("w"))
    coded = words.select("w", F.expr(_SDX_EXPR).alias("sdx"))
    return (
        coded.groupBy("sdx")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_parts"),
            F.count_distinct("w").cast("long").alias("n_words"),
            F.min("w").alias("first_word"),
        )
        .orderBy(F.col("n_parts").desc(), "sdx")
    )


# ------------------------------------------------------------- Luhn

def _luhn_sum(div: str) -> str:
    """Luhn checksum of the 12-digit number `num`: rightmost digit is
    position 0; every odd position doubles (then digit-sums). Generated as
    12 closed-form terms — identical string in both engines modulo the
    integer-divide token."""
    terms = []
    for i in range(12):
        d = f"((num {div} {10 ** i}) % 10)"
        if i % 2 == 1:
            terms.append(f"((2 * {d}) {div} 10 + (2 * {d}) % 10)")
        else:
            terms.append(d)
    return " + ".join(terms)


_LUHN_SQL = f"""
WITH nums AS (
  SELECT o_orderpriority,
         (o_orderkey * 2654435761) % 1000000000000 AS num
  FROM orders
),
checked AS (
  SELECT o_orderpriority,
         CASE WHEN ({_luhn_sum('//')}) % 10 = 0 THEN 1 ELSE 0 END AS ok
  FROM nums
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(ok) AS BIGINT) AS n_valid
FROM checked
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register("fn_luhn_checksum", oracle=_LUHN_SQL, tier="T2")
def fn_luhn_checksum(spark, sf_dir):
    """Luhn (mod-10) checksum validation over fabricated 12-digit account
    numbers — the card/IMEI/account check-digit algorithm, spelled as a
    closed-form 12-term integer expression (digit extraction via DIV/%,
    odd positions doubled then digit-summed) so the whole validation is
    one codegen projection, no UDF and no string parsing.

    Determinism: all operands non-negative int64 (orderkey·2654435761 ≤
    ~4e16), so DIV/% agree across engines exactly; ~10% of fabricated
    numbers pass, as expected for a uniform distribution.

    Scale: map-only + one aggregate on a 5-value key.
    """
    o = load(spark, sf_dir, "orders")
    nums = o.select(
        "o_orderpriority",
        F.expr("(o_orderkey * 2654435761) % 1000000000000").alias("num"),
    )
    checked = nums.select(
        "o_orderpriority",
        F.expr(
            f"CASE WHEN ({_luhn_sum('DIV')}) % 10 = 0 THEN 1 ELSE 0 END"
        ).alias("ok"),
    )
    return (
        checked.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("ok").cast("long").alias("n_valid"),
        )
        .orderBy("o_orderpriority")
    )


# ------------------------------------------------------ calendar dim

_CALENDAR_SQL = """
WITH days AS (
  SELECT DATE '2024-01-01' + CAST(g.i AS INT) AS day,
         CAST(date_diff('day', DATE '1970-01-01',
                        DATE '2024-01-01' + CAST(g.i AS INT)) AS BIGINT)
           AS epoch_day
  FROM (SELECT unnest(generate_series(0, 365)) AS i) g
)
SELECT day, epoch_day,
       CAST((epoch_day + 4) % 7 AS BIGINT) AS dow,
       CASE WHEN (epoch_day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
       CAST(EXTRACT(month FROM day) AS BIGINT) AS month,
       CAST((EXTRACT(month FROM day) - 1) // 3 + 1 AS BIGINT) AS quarter,
       CAST(EXTRACT(day FROM day) AS BIGINT) AS day_of_month,
       epoch_day // 7 AS epoch_week,
       CAST(date_diff('day', date_trunc('month', day), day) + 1 AS BIGINT)
         AS dom_check
FROM days
ORDER BY day
"""


@register("fn_calendar_dim", oracle=_CALENDAR_SQL, tier="T2")
def fn_calendar_dim(spark, sf_dir):
    """Calendar-dimension generation — the date spine every warehouse
    builds first: one row per day of 2024 (a range, not a table scan) with
    day-of-week, weekend flag, month/quarter/day-of-month, and the
    epoch-week block id. Generated with `spark.range`, so the spine needs
    no source data and parallelizes trivially.

    Determinism: day-of-week is (epoch_days + 4) % 7 — NEVER the engines'
    dayofweek()/dow(), whose numbering disagrees (Spark 1=Sunday, DuckDB
    0=Sunday; the pinned hazard class) — and weeks are epoch_days DIV 7
    blocks, not ISO weeks. Month/quarter/day-of-month extract identically;
    dom_check re-derives day-of-month from date_trunc as a cross-engine
    consistency probe inside the row itself.

    Scale: a generated range is embarrassingly parallel and columnar from
    birth; at 100 TB the spine is still 36 525 rows per century —
    broadcast it against facts, never join facts to a date function.
    """
    days = spark.range(0, 366).select(
        F.expr("date_add(DATE '2024-01-01', CAST(id AS INT))").alias("day"),
        F.expr("CAST(datediff(date_add(DATE '2024-01-01', CAST(id AS INT)),"
               " DATE '1970-01-01') AS BIGINT)").alias("epoch_day"),
    )
    return days.select(
        "day",
        "epoch_day",
        F.expr("CAST((epoch_day + 4) % 7 AS BIGINT)").alias("dow"),
        F.expr(
            "CASE WHEN (epoch_day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END"
        ).alias("is_weekend"),
        F.month("day").cast("long").alias("month"),
        F.expr("CAST((month(day) - 1) DIV 3 + 1 AS BIGINT)").alias("quarter"),
        F.dayofmonth("day").cast("long").alias("day_of_month"),
        F.expr("epoch_day DIV 7").alias("epoch_week"),
        F.expr(
            "CAST(datediff(day, date_trunc('MONTH', day)) + 1 AS BIGINT)"
        ).alias("dom_check"),
    ).orderBy("day")
