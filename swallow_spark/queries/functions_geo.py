"""Geo/network scalar-function surfaces: geohash encoding (bit-interleaved
base32 spatial bucketing — the standard prefix-joinable spatial key) and
IPv4/CIDR arithmetic (dotted-quad render, /16 rollup, RFC-1918 classing).

The fixture tables carry no coordinates or addresses, so both keys fabricate
them deterministically from integer keys with modular arithmetic (the
fn_haversine convention) — the POINT is the function surface: the encode /
parse / rollup expressions are exactly what a user would run on real
lat/lon/ip columns.

Determinism: everything is non-negative int64 arithmetic (DIV/% on
non-negative operands truncate identically in Spark and DuckDB); the
geohash bit interleave is generated ONCE in Python as a sum of
(quotient % 2) · 2^k terms and rendered with each engine's integer-divide
token, so both engines evaluate the same closed form — no loops, no UDFs,
whole-stage codegen end-to-end.

Scale notes: both keys are map-only projections feeding one partial+final
aggregate; the geohash prefix is exactly the blocking key you'd join on at
100 TB (prefix-equality ⇒ proximity), same role as join_grid_spatial's
cell id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load
from ..registry import register

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _interleave(div: str) -> str:
    """30-bit geohash integer: lon bit j of 15 at position 29-2j (MSB
    first, lon leads), lat bit j at 28-2j. `div` is the engine's integer
    divide token."""
    terms = []
    for j in range(15):
        lon_shift = 2 ** (14 - j)
        lat_shift = 2 ** (14 - j)
        terms.append(f"((lonq {div} {lon_shift}) % 2) * {2 ** (29 - 2 * j)}")
        terms.append(f"((latq {div} {lat_shift}) % 2) * {2 ** (28 - 2 * j)}")
    return " + ".join(terms)


def _b32_encode(div: str) -> str:
    """Six base32 chars from the 30-bit integer `gh`."""
    parts = []
    for k in range(6):
        shift = 2 ** (5 * (5 - k))
        parts.append(f"substr('{_B32}', CAST((gh {div} {shift}) % 32 AS INT) + 1, 1)")
    return " || ".join(parts)


_GEO_FABRICATE = """
  CAST((user_id * 2654435761 + event_id * 40503) % 180000000 AS BIGINT) AS lat_u,
  CAST((user_id * 97 + event_id * 2654435761) % 360000000 AS BIGINT) AS lon_u
"""

_GEOHASH_SQL = f"""
WITH pts AS (
  SELECT user_id, {_GEO_FABRICATE}
  FROM events WHERE user_id IS NOT NULL
),
q AS (
  SELECT user_id,
         (lat_u * 32768) // 180000000 AS latq,
         (lon_u * 32768) // 360000000 AS lonq
  FROM pts
),
g AS (
  SELECT user_id, {_interleave('//')} AS gh FROM q
),
enc AS (
  SELECT user_id, {_b32_encode('//')} AS geohash6 FROM g
)
SELECT substr(geohash6, 1, 3) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       MIN(geohash6) AS first_hash,
       MAX(geohash6) AS last_hash
FROM enc
GROUP BY cell
ORDER BY n DESC, cell
LIMIT 20
"""


@register("fn_geohash", oracle=_GEOHASH_SQL, tier="T2")
def fn_geohash(spark, sf_dir):
    """Geohash-6 encode of fabricated event coordinates, rolled up to the
    20 densest precision-3 cells. Encode = quantize lat/lon to 15 bits
    each against their [0,180)/[0,360) micro-degree ranges, interleave
    (lon leads, MSB first), base32 with the geohash alphabet — the prefix
    property (shared prefix ⇒ bounded distance) is what makes the column a
    spatial blocking/join key.

    Scale: map-only encode (pure codegen integer expression — the
    interleave is 30 multiply-add terms, no UDF), one aggregate on the
    3-char prefix. At 100 TB the prefix length is the knob: each extra
    char splits cells 32×; choose so per-cell rows fit an executor, then
    prefix-equality joins replace radius scans (see join_grid_spatial).
    """
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    pts = e.select(
        "user_id",
        F.expr(
            "CAST((user_id * 2654435761 + event_id * 40503) % 180000000 AS BIGINT)"
        ).alias("lat_u"),
        F.expr(
            "CAST((user_id * 97 + event_id * 2654435761) % 360000000 AS BIGINT)"
        ).alias("lon_u"),
    )
    q = pts.select(
        "user_id",
        F.expr("(lat_u * 32768) DIV 180000000").alias("latq"),
        F.expr("(lon_u * 32768) DIV 360000000").alias("lonq"),
    )
    g = q.select("user_id", F.expr(_interleave("DIV")).alias("gh"))
    enc = g.select("user_id", F.expr(_b32_encode("DIV")).alias("geohash6"))
    return (
        enc.groupBy(F.substring("geohash6", 1, 3).alias("cell"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.min("geohash6").alias("first_hash"),
            F.max("geohash6").alias("last_hash"),
        )
        .orderBy(F.col("n").desc(), "cell")
        .limit(20)
    )


_IP_SQL = """
WITH ips AS (
  SELECT (event_id * 2654435761) % 4294967296 AS ip
  FROM events
),
parts AS (
  SELECT ip,
         ip // 16777216 AS o1,
         (ip // 65536) % 256 AS o2,
         ip // 65536 AS blk16
  FROM ips
)
SELECT CAST(o1 AS VARCHAR) || '.' || CAST(o2 AS VARCHAR) || '.0.0/16' AS cidr16,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(ip) AS BIGINT) AS min_ip,
       CAST(MAX(ip) AS BIGINT) AS max_ip,
       CASE WHEN o1 = 10 OR (o1 = 172 AND o2 BETWEEN 16 AND 31)
                 OR (o1 = 192 AND o2 = 168)
            THEN 1 ELSE 0 END AS rfc1918
FROM parts
GROUP BY cidr16, rfc1918
ORDER BY n DESC, cidr16
LIMIT 20
"""


@register("fn_ip_cidr", oracle=_IP_SQL, tier="T2")
def fn_ip_cidr(spark, sf_dir):
    """IPv4/CIDR arithmetic over fabricated addresses: uint32 → octets via
    integer divide/modulo, /16 block rollup rendered as `a.b.0.0/16`, and
    RFC-1918 private-range classification as a pure integer predicate —
    the standard log-analytics sessionization/denylist shapes, no string
    parsing in the hot path.

    Determinism: all operands non-negative int64 (the Knuth-multiplier
    fabrication stays under 2^63 at any fixture scale: event_id·2654435761
    ≤ ~1e7·2.7e9 ≈ 2.7e16), so DIV/% agree across engines exactly.

    Scale: map-only projection + one aggregate on the /16 key (65 536
    possible groups — a bounded-cardinality rollup at any data size);
    TakeOrderedAndProject top-20.
    """
    e = load(spark, sf_dir, "events")
    parts = e.select(
        F.expr("(event_id * 2654435761) % 4294967296").alias("ip")
    ).select(
        "ip",
        F.expr("ip DIV 16777216").alias("o1"),
        F.expr("(ip DIV 65536) % 256").alias("o2"),
    )
    return (
        parts.groupBy(
            F.concat(
                F.col("o1").cast("string"),
                F.lit("."),
                F.col("o2").cast("string"),
                F.lit(".0.0/16"),
            ).alias("cidr16"),
            F.when(
                (F.col("o1") == 10)
                | ((F.col("o1") == 172) & F.col("o2").between(16, 31))
                | ((F.col("o1") == 192) & (F.col("o2") == 168)),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .alias("rfc1918"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("ip").cast("long").alias("min_ip"),
            F.max("ip").cast("long").alias("max_ip"),
        )
        .select("cidr16", "n", "min_ip", "max_ip", "rfc1918")
        .orderBy(F.col("n").desc(), "cidr16")
        .limit(20)
    )
