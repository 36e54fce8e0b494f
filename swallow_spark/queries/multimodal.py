"""Multimodal binary-column operators (task north star: image/audio/video as
opaque binary + typed metadata; decode / feature-extract / resize /
frame-sample as Arrow-batched Python over mapInPandas).

The container has no media libs, so DECODERS are stubs — but the plumbing is
real: BinaryType columns, deterministic byte math, Arrow batch signatures,
fan-out schemas. `multimodal_audio_features` goes further: its "waveform"
is the payload's byte values, so the numpy feature extraction (mean/RMS/
peak via exact integer sums) is fully ORACLE-CHECKED against DuckDB
computing the same features from the character codes — a decode→feature
pipeline with a provable result, not just a smoke test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..conform import sql_rnd
from ..io import load
from ..registry import register


def decode_bytes_waveform(payload: bytes):
    """STUB decoder: the payload bytes ARE the samples (uint8 waveform).

    This is the injection seam for real media decoding — swap in a
    ``bytes -> np.ndarray`` callable (librosa/soundfile/ffmpeg) via
    ``audio_feature_extractor(decode=...)`` without touching the operator.
    """
    import numpy as np

    return np.frombuffer(payload, dtype=np.uint8)


def audio_feature_extractor(decode=decode_bytes_waveform):
    """Build the mapInPandas batch fn computing mean/RMS/peak per payload.

    Feature math is fully vectorized across the batch: decoded waveforms are
    concatenated into ONE sample buffer and per-row exact integer sums come
    from np.add.reduceat / np.maximum.reduceat over the row offsets — no
    per-row Python arithmetic. Only the (opaque, injectable) decode call
    itself runs per row.
    """
    import numpy as np
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            # NULL payload → all-NULL feature row (the oracle's NULL text
            # propagates through hex/generate_series to NULL cs/len)
            null_row = np.array([p is None for p in pdf["payload"]])
            waves = [
                np.array([], dtype=np.int64)
                if p is None
                else np.asarray(decode(bytes(p)), dtype=np.int64)
                for p in pdf["payload"]
            ]
            lens = np.array([w.size for w in waves], dtype=np.int64)
            n = len(lens)
            mean = np.full(n, np.nan)
            rms = np.full(n, np.nan)
            peak = pd.array([None] * n, dtype="Int64")
            nz = lens > 0
            if nz.any():
                cat = np.concatenate([w for w in waves if w.size])
                l_nz = lens[nz]
                starts = np.concatenate(([0], np.cumsum(l_nz)[:-1]))
                s = np.add.reduceat(cat, starts)
                s2 = np.add.reduceat(cat * cat, starts)
                mean[nz] = np.floor(s / l_nz * 10000 + 0.5) / 10000
                rms[nz] = np.floor(np.sqrt(s2 / l_nz) * 10000 + 0.5) / 10000
                peak[nz] = np.maximum.reduceat(cat, starts)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_samples": pd.array(
                        [None if b else int(x) for b, x in zip(null_row, lens)],
                        dtype="Int64",
                    ),
                    "mean_amp": mean,
                    "rms": rms,
                    "peak": peak,
                }
            )

    return extract


@register(
    "multimodal_audio_features",
    oracle=f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
codes AS (
  -- true BYTE values via hex-pair decode (DuckDB cannot index BLOBs):
  -- byte i = 16*hi + lo nibbles of hex chars 2i-1, 2i. Matches the Spark
  -- side's uint8 view of the payload for ANY UTF-8 input, not just ASCII
  -- (the unicode drift probe caught the old codepoint-based oracle).
  SELECT doc_id,
         list_transform(generate_series(CAST(1 AS BIGINT), n),
           i -> CAST(16 * (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1)
                     + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1)
                AS BIGINT)) AS cs
  FROM h
)
SELECT doc_id,
       CAST(len(cs) AS BIGINT) AS n_samples,
       {sql_rnd('CAST(list_sum(cs) AS DOUBLE) / len(cs)', 4)} AS mean_amp,
       {sql_rnd('sqrt(CAST(list_sum(list_transform(cs, c -> c * c)) AS DOUBLE) / len(cs))', 4)} AS rms,
       CAST(list_max(cs) AS BIGINT) AS peak
FROM codes
""",
    tier="T2",
)
def multimodal_audio_features(spark, sf_dir):
    """Audio-style feature extraction over an opaque binary payload:
    mean amplitude / RMS / peak of the byte "waveform", computed with numpy
    inside mapInPandas from exact integer sums (order-independent, so the
    Arrow batching cannot change the result — oracle-checked). Decode is the
    injectable stub `decode_bytes_waveform`; features vectorize across the
    whole Arrow batch via reduceat (see audio_feature_extractor)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        audio_feature_extractor(),
        "doc_id long, n_samples long, mean_amp double, rms double, peak long",
    )


def decode_bytes_frames(payload: bytes, frame: int = 16):
    """STUB frame decoder: fixed-size byte slices as "frames". The seam for
    a real container demuxer (pyav/ffmpeg) returning a list of frame
    payloads — swap via ``frame_sampler(decode=...)``."""
    return [payload[i : i + frame] for i in range(0, len(payload) // frame * frame, frame)]


def frame_sampler(decode=decode_bytes_frames, stride: int = 4):
    """Build the mapInPandas batch fn: decode → stride-sample → one row per
    kept frame (the fan-out shape a real video pipeline uses). Emits the
    frame bytes as an uppercase hex string so the declared output stays
    scalar (the round-1 output contract) and the byte math is oracle-checkable:
    a byte slice [o, o+16) of the payload IS the hex-char slice
    [2o, 2o+32) of hex(payload), in any engine, for any UTF-8 input."""
    import pandas as pd

    def sample(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": [], "frame_hex": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    # NULL payload → zero frames (the oracle's lateral
                    # unnest over a NULL series drops the row)
                    continue
                frames = decode(bytes(payload))
                off = 0
                for fi, fb in enumerate(frames):
                    if fi % stride == 0:
                        rows["doc_id"].append(doc_id)
                        rows["frame_idx"].append(fi)
                        rows["offset"].append(off)
                        rows["frame_hex"].append(fb.hex().upper())
                    off += len(fb)
            yield pd.DataFrame(rows)

    return sample


@register(
    "multimodal_frame_sample",
    oracle="""
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS ph,
         octet_length(encode(text)) AS n
  FROM documents
),
i AS (
  SELECT doc_id, ph, t.fi
  FROM f, unnest(generate_series(CAST(0 AS BIGINT), CAST(n // 16 AS BIGINT) - 1)) AS t(fi)
)
SELECT doc_id,
       CAST(fi AS INT) AS frame_idx,
       CAST(fi * 16 AS BIGINT) AS "offset",
       substr(ph, CAST(fi * 32 + 1 AS BIGINT), 32) AS frame_hex
FROM i WHERE fi % 4 = 0
""",
    tier="T2",
)
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling: treat the payload as fixed-size 16-byte
    frames, keep every 4th frame (stride sampling), emit one row per kept
    frame with its byte offset and hex-encoded bytes — the fan-out shape a
    real video pipeline (decode → sample → per-frame model) uses.

    Real plumbing, stub decode: `decode_bytes_frames` slices bytes; a real
    demuxer plugs into `frame_sampler(decode=...)` without touching this
    operator. ORACLE-CHECKED via the hex trick: DuckDB cannot slice BLOBs,
    but byte slice [o, o+16) of the payload equals hex-char slice
    [2o, 2o+32) of hex(payload) — exact byte semantics, drift-proof even if
    regenerated testdata turns non-ASCII.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        frame_sampler(), "doc_id long, frame_idx int, offset long, frame_hex string"
    )


@register(
    "multimodal_image_tiles",
    oracle="""
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS ph,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       CAST(t.i - 1 AS INT) AS tile_idx,
       substr(ph, (t.i - 1) * 128 + 1, 128) AS tile_hex,
       CAST(length(substr(ph, (t.i - 1) * 128 + 1, 128)) / 2 AS BIGINT) AS tile_len
FROM f, unnest(generate_series(CAST(1 AS BIGINT), greatest(CAST(n // 64 AS BIGINT), 1))) AS t(i)
""",
    tier="T2",
)
def multimodal_image_tiles(spark, sf_dir):
    """Image-style tiling entirely in JVM expressions: slice the binary
    payload into 64-byte tiles with posexplode — fan-out without Python.

    Stub decode (tiles are byte ranges, a real impl tiles pixel grids); the
    partitioning story is the point: tiles shuffle by (doc, tile) so
    per-tile feature extraction parallelizes beyond per-image. ORACLE-CHECKED
    via the hex trick (see multimodal_frame_sample): each 64-byte binary
    tile is emitted as its 128-hex-char slice, byte-exact in both engines."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )
    TILE = 64
    # substring with a dynamic start needs the SQL lambda form
    tiles = F.expr(
        f"transform(sequence(1, greatest(cast(n_bytes / {TILE} as int), 1)), "
        f"i -> substring(payload, (i - 1) * {TILE} + 1, {TILE}))"
    )
    return (
        d.select("doc_id", F.posexplode(tiles).alias("tile_idx", "tile"))
        .select(
            "doc_id",
            "tile_idx",
            F.hex("tile").alias("tile_hex"),
            F.length("tile").cast("long").alias("tile_len"),
        )
    )


# dHash over the first 61 payload bytes: bit i (i = 1..60) is b[i] > b[i+1]
_PHASH_BITS = 60
_PHASH_MIN_BYTES = _PHASH_BITS + 1

# hex-pair byte decode (see multimodal_audio_features for why hex, not
# codepoints): byte i of the payload from hex chars 2i-1, 2i
_PH_BYTE = (
    "(16 * (strpos('0123456789ABCDEF', substr(hx, 2 * ({i}) - 1, 1)) - 1)"
    " + (strpos('0123456789ABCDEF', substr(hx, 2 * ({i}), 1)) - 1))"
)

_PHASH_SQL = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
  FROM documents
),
ph AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(CAST(1 AS BIGINT), {_PHASH_BITS}),
           i -> CASE WHEN {_PH_BYTE.format(i='i')} > {_PH_BYTE.format(i='i + 1')}
                     THEN CAST(1 AS BIGINT) << (i - 1) ELSE CAST(0 AS BIGINT) END))
              AS BIGINT) AS phash
  FROM h WHERE n >= {_PHASH_MIN_BYTES}
)
SELECT doc_id, phash,
       CAST(COUNT(*) OVER (PARTITION BY phash) > 1 AS INT) AS is_dup
FROM ph
"""


def phash_extractor(decode=None):
    """mapInPandas body: dHash-{bits} of each payload's leading bytes.

    `decode` is the injectable decoder seam (same convention as
    audio_feature_extractor); the default reads the raw bytes — a real
    image pipeline would decode pixels and dHash a downscaled grayscale
    grid, with everything after the decode unchanged."""
    import numpy as np
    import pandas as pd

    weights = (np.int64(1) << np.arange(_PHASH_BITS, dtype=np.int64))

    def extract(batches):
        for pdf in batches:
            rows = [
                (did, payload)
                for did, payload in zip(pdf["doc_id"], pdf["payload"])
                if payload is not None and len(payload) >= _PHASH_MIN_BYTES
            ]
            if not rows:
                continue
            ids = np.array([r[0] for r in rows], dtype=np.int64)
            # one (n, 61) uint8 matrix from the leading byte slices, then a
            # fully vectorized compare + weighted sum across the batch
            mat = np.stack(
                [
                    np.frombuffer(r[1], dtype=np.uint8, count=_PHASH_MIN_BYTES)
                    for r in rows
                ]
            )
            bits = mat[:, : _PHASH_BITS] > mat[:, 1 : _PHASH_BITS + 1]
            phash = bits.astype(np.int64) @ weights
            yield pd.DataFrame({"doc_id": ids, "phash": phash})

    return extract


@register("multimodal_phash_dedup", oracle=_PHASH_SQL, tier="T2")
def multimodal_phash_dedup(spark, sf_dir):
    """Perceptual-hash dedup over opaque binary payloads: a 60-bit dHash
    (consecutive-byte gradient signs) per document, with documents sharing
    a hash flagged as perceptual duplicates — the image/audio analog of
    content-hash dedup, robust to content that differs only in trailing
    bytes. Payloads shorter than 61 bytes are excluded on both sides.

    ORACLE-CHECKED via the hex-pair byte decode (byte-exact for any UTF-8
    payload, per the unicode drift probe's lesson on the audio key);
    gradient bits and the bit-weighted sum are pure int64.

    Scale note: the hash pass is map-only (one Arrow batch sweep, no
    shuffle); the dup flag is a window count keyed by the 60-bit hash —
    shuffle carries |docs| fixed-width rows, and hot hash buckets ARE the
    signal, not skew to mitigate.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    ph = d.mapInPandas(phash_extractor(), "doc_id long, phash long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("phash")
    return ph.select(
        "doc_id",
        "phash",
        (F.count(F.lit(1)).over(w) > 1).cast("int").alias("is_dup"),
    )


_SCENE_FRAME = 16  # bytes per synthetic frame
_SCENE_TH = 128  # |Δ luma-sum| above this = scene cut


@register(
    "multimodal_scene_cuts",
    oracle=f"""
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS ph,
         octet_length(encode(text)) // {_SCENE_FRAME} AS n_frames
  FROM documents WHERE text IS NOT NULL
),
fr AS (
  SELECT doc_id, g.k AS frame_idx,
         CAST(list_sum(list_transform(generate_series(1, {_SCENE_FRAME}),
           j -> (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_SCENE_FRAME * 2}) * (g.k - 1) + 2 * j - 1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_SCENE_FRAME * 2}) * (g.k - 1) + 2 * j AS INT), 1)) - 1)
         )) AS BIGINT) AS luma
  FROM f, LATERAL (SELECT unnest(generate_series(1, n_frames)) AS k) g
  WHERE n_frames >= 1
),
d AS (
  SELECT doc_id, frame_idx, luma,
         abs(luma - lag(luma) OVER (PARTITION BY doc_id ORDER BY frame_idx)) AS jump
  FROM fr
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(CASE WHEN jump > {_SCENE_TH} THEN 1 END) AS BIGINT) AS n_cuts,
       CAST(MIN(CASE WHEN jump > {_SCENE_TH} THEN frame_idx END) AS BIGINT) AS first_cut_idx,
       CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump
FROM d GROUP BY doc_id
""",
    tier="T2",
)
def multimodal_scene_cuts(spark, sf_dir):
    """Scene-cut detection over a synthetic video: the payload's 16-byte
    frames reduce to an integer "luma" feature (byte sum — stand-in for a
    decoded frame's luminance histogram), and a cut is any frame whose
    |Δluma| vs the previous frame exceeds the threshold. Emits per video:
    frame count, cut count, first cut index, max jump — the shot-boundary
    pass a video-training pipeline runs before frame sampling, with the
    decode step exactly as stubbed/pluggable as multimodal_frame_sample's.

    ORACLE-CHECKED via the hex trick (DuckDB cannot slice BLOBs: byte k of
    the payload = hex chars [2k−1, 2k], folded to an integer with a
    strpos('0123456789ABCDEF') table — the same base-16 character fold as
    sketch_hll_portable). All arithmetic is exact integers.

    Scale note: map-only per video (Arrow-batched numpy reshape + diff; no
    shuffle) — at 100 TB each video row reduces independently, and a real
    decoder slots into the same per-batch loop without changing the plan.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )

    def cuts(it):
        for pdf in it:
            out = {"doc_id": [], "n_frames": [], "n_cuts": [],
                   "first_cut_idx": [], "max_jump": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                n = len(b) // _SCENE_FRAME
                if n < 1:
                    continue
                luma = (
                    b[: n * _SCENE_FRAME]
                    .reshape(n, _SCENE_FRAME)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                jump = np.abs(np.diff(luma))
                cut_idx = np.nonzero(jump > _SCENE_TH)[0]
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n)
                out["n_cuts"].append(len(cut_idx))
                # frame_idx is 1-based in the oracle; jump i belongs to frame i+2
                out["first_cut_idx"].append(
                    int(cut_idx[0]) + 2 if len(cut_idx) else None
                )
                out["max_jump"].append(int(jump.max()) if len(jump) else 0)
            if out["doc_id"]:
                yield pd.DataFrame(
                    {
                        "doc_id": out["doc_id"],
                        "n_frames": out["n_frames"],
                        "n_cuts": out["n_cuts"],
                        "first_cut_idx": pd.array(out["first_cut_idx"], dtype="Int64"),
                        "max_jump": out["max_jump"],
                    }
                )

    return d.mapInPandas(
        cuts,
        "doc_id long, n_frames long, n_cuts long, first_cut_idx long, max_jump long",
    )


_TLV_CAP = 64  # bounded-prefix parse: max records walked per container


def _tlv_byte_sql(off_expr: str) -> str:
    """Oracle byte read at 0-based offset via the hex trick (chars are
    1-based, so byte o lives at hex positions 2o+1, 2o+2). Out-of-range
    reads fold to a negative sentinel whose %16 makes every guard fail."""
    hi = f"(strpos('0123456789ABCDEF', substr(f.ph, CAST(2 * ({off_expr}) + 1 AS INT), 1)) - 1)"
    lo = f"(strpos('0123456789ABCDEF', substr(f.ph, CAST(2 * ({off_expr}) + 2 AS INT), 1)) - 1)"
    return f"({hi} * 16 + {lo})"


@register(
    "multimodal_container_parse",
    oracle=f"""
WITH RECURSIVE f AS (
  SELECT doc_id, hex(encode(text)) AS ph,
         octet_length(encode(text)) AS nb
  FROM documents WHERE text IS NOT NULL
),
walk(doc_id, off, nrec, hsum) AS (
  SELECT doc_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT), CAST(0 AS BIGINT)
  FROM f
  UNION ALL
  SELECT w.doc_id,
         w.off + 2 + {_tlv_byte_sql('w.off')} % 16,
         w.nrec + 1,
         w.hsum + {_tlv_byte_sql('w.off + 1')}
  FROM walk w JOIN f ON f.doc_id = w.doc_id
  WHERE w.nrec < {_TLV_CAP}
    AND w.off + 2 + {_tlv_byte_sql('w.off')} % 16 <= f.nb
)
SELECT doc_id,
       CAST(MAX(nrec) AS BIGINT) AS n_records,
       CAST(MAX(off) AS BIGINT) AS bytes_consumed,
       CAST(MAX(hsum) AS BIGINT) AS payload_head_sum
FROM walk GROUP BY doc_id
""",
    tier="T2",
)
def multimodal_container_parse(spark, sf_dir):
    """Parse a TLV container (the MP4-box / Matroska-element / protobuf
    wire-format shape): the payload is a stream of records, each a 1-byte
    header whose low nibble encodes the payload length (L = b[off]%16 + 1)
    followed by L payload bytes — so every record boundary depends on the
    bytes BEFORE it, the data-dependent walk that separates container
    demuxing from fixed-stride slicing (multimodal_frame_sample). Emits
    per container: records parsed, bytes consumed, and the sum of each
    record's first payload byte (the "codec id" probe a real demuxer
    reads); a trailing truncated record is left unconsumed, and the walk
    caps at 64 records (bounded-prefix parse — the scale story is that
    header scans never inflate with payload size).

    ORACLE-CHECKED: the payload is encode(text) on both sides; DuckDB
    replays the exact walk as a recursive CTE over the hex string (byte k
    = base-16 char fold, the scene_cuts trick), advancing every container
    one record per recursion step; out-of-range reads produce a negative
    sentinel that can never satisfy the advance guard, so termination is
    structural in both engines.

    Scale note: map-only per container (Arrow batches in, one sequential
    walk per row in numpy bytes — a real demuxer is exactly this loop over
    a BinaryType column); no shuffle, columns prune to (doc_id, text).
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )

    def parse(it):
        for pdf in it:
            out = {"doc_id": [], "n_records": [], "bytes_consumed": [],
                   "payload_head_sum": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                nb = len(b)
                off = nrec = hsum = 0
                while nrec < _TLV_CAP and off < nb:
                    ln = int(b[off]) % 16 + 1
                    if off + 1 + ln > nb:  # trailing truncated record
                        break
                    hsum += int(b[off + 1])
                    off += 1 + ln
                    nrec += 1
                out["doc_id"].append(doc_id)
                out["n_records"].append(nrec)
                out["bytes_consumed"].append(off)
                out["payload_head_sum"].append(hsum)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return d.mapInPandas(
        parse,
        "doc_id long, n_records long, bytes_consumed long, "
        "payload_head_sum long",
    )


# --------------------------------------------------------------------- VAD

_VAD_FRAME = 8
_VAD_THRESH = 800
_VAD_MIN_RUN = 2


def vad_extractor(
    decode=decode_bytes_waveform,
    frame: int = _VAD_FRAME,
    thresh: int = _VAD_THRESH,
    min_run: int = _VAD_MIN_RUN,
):
    """Build the mapInPandas batch fn for energy-threshold VAD.

    Fully vectorized across the Arrow batch: all rows' frames concatenate
    into one (n_frames, frame) reshape whose row sums are the energies;
    voiced runs are found with one cumsum over run-start flags (doc
    boundaries force a break) and per-doc segment stats come from
    np.bincount — no per-row Python loops beyond the injectable decode.
    """
    import numpy as np
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            n = len(pdf)
            null_row = np.array([p is None for p in pdf["payload"]])
            waves = [
                np.array([], dtype=np.int64)
                if p is None
                else np.asarray(decode(bytes(p)), dtype=np.int64)
                for p in pdf["payload"]
            ]
            nf = np.array([w.size // frame for w in waves], dtype=np.int64)
            voiced_kept = np.zeros(n, dtype=np.int64)
            nseg = np.zeros(n, dtype=np.int64)
            if nf.sum():
                cat = np.concatenate(
                    [w[: m * frame] for w, m in zip(waves, nf) if m]
                )
                sums = cat.reshape(-1, frame).sum(axis=1)
                voiced = sums >= thresh
                doc_idx = np.repeat(np.arange(n), nf)
                prev_v = np.concatenate(([False], voiced[:-1]))
                prev_d = np.concatenate(([-1], doc_idx[:-1]))
                starts = voiced & (~prev_v | (prev_d != doc_idx))
                if starts.any():
                    run_id = np.cumsum(starts) - 1
                    run_len = np.bincount(run_id[voiced])
                    run_doc = doc_idx[starts]
                    keep = run_len >= min_run
                    nseg = np.bincount(run_doc[keep], minlength=n)
                    voiced_kept = np.bincount(
                        run_doc[keep], weights=run_len[keep], minlength=n
                    ).astype(np.int64)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_frames": pd.array(
                        [None if b else int(x) for b, x in zip(null_row, nf)],
                        dtype="Int64",
                    ),
                    "voiced_frames": pd.array(
                        [
                            None if b else int(x)
                            for b, x in zip(null_row, voiced_kept)
                        ],
                        dtype="Int64",
                    ),
                    "n_segments": pd.array(
                        [None if b else int(x) for b, x in zip(null_row, nseg)],
                        dtype="Int64",
                    ),
                }
            )

    return extract


_VAD_BYTE = (
    "16 * (strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1)"
    " + (strpos('0123456789ABCDEF', substr(hx, 2 * i, 1)) - 1)"
)

_VAD_SQL = f"""
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents
),
fr AS (
  SELECT doc_id, n // {_VAD_FRAME} AS n_frames,
         list_transform(generate_series(CAST(1 AS BIGINT), n // {_VAD_FRAME}),
           f -> struct_pack(fi := f,
                  fsum := CAST(list_sum(list_transform(
                    generate_series({_VAD_FRAME} * (f - 1) + 1, {_VAD_FRAME} * f),
                    i -> {_VAD_BYTE})) AS BIGINT))) AS fs
  FROM h
),
t AS (SELECT doc_id, unnest(fs) AS s FROM fr),
seg AS (
  SELECT doc_id, s.fi AS fi, (s.fsum >= {_VAD_THRESH}) AS voiced FROM t
),
g AS (
  SELECT doc_id, fi, voiced,
         fi - ROW_NUMBER() OVER (PARTITION BY doc_id, voiced ORDER BY fi) AS grp
  FROM seg
),
runs AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM g WHERE voiced GROUP BY doc_id, grp
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) FILTER (WHERE run_len >= {_VAD_MIN_RUN}) AS BIGINT)
           AS n_segments,
         CAST(COALESCE(SUM(run_len) FILTER (WHERE run_len >= {_VAD_MIN_RUN}), 0)
           AS BIGINT) AS voiced_frames
  FROM runs GROUP BY doc_id
)
SELECT h.doc_id,
       CASE WHEN h.n IS NULL THEN NULL ELSE h.n // {_VAD_FRAME} END AS n_frames,
       CASE WHEN h.n IS NULL THEN NULL
            ELSE COALESCE(agg.voiced_frames, 0) END AS voiced_frames,
       CASE WHEN h.n IS NULL THEN NULL
            ELSE COALESCE(agg.n_segments, 0) END AS n_segments
FROM h LEFT JOIN agg ON agg.doc_id = h.doc_id
"""


@register("multimodal_audio_vad", oracle=_VAD_SQL, tier="T2")
def multimodal_audio_vad(spark, sf_dir):
    """Voice-activity detection over the opaque byte "waveform": 8-byte
    frames, energy = exact integer frame sum, voiced iff energy ≥ 800,
    smoothed by dropping voiced runs shorter than 2 frames — per doc the
    frame count, kept voiced-frame count, and speech-segment count. The
    speech/music/silence segmentation pass an audio curation pipeline runs
    before transcription, with the decode stub injectable exactly like
    multimodal_audio_features.

    Determinism: pure integer energy sums and run lengths; the run
    smoothing is the gaps-and-islands construction (run key = frame_idx −
    row_number within (doc, voiced)) in the oracle and a vectorized
    cumsum-over-run-starts in numpy — same segments by construction.
    NULL payload → NULL row (the established multimodal convention).
    Scale: map-only mapInPandas (the frame expansion lives inside the
    Arrow batch, never shuffled); the oracle's window runs per-doc.
    """
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        vad_extractor(),
        "doc_id long, n_frames long, voiced_frames long, n_segments long",
    )


# ------------------------------------------------------------ A/V sync
_AV_WIN = 8  # bytes per synthetic audio window
_AV_TH = 800  # window byte-sum above this = voiced


@register(
    "multimodal_av_sync",
    oracle=f"""
WITH f AS (
  SELECT doc_id, hex(encode(text)) AS ph,
         octet_length(encode(text)) // {_SCENE_FRAME} AS n_frames,
         octet_length(encode(text)) // {_AV_WIN} AS n_windows
  FROM documents WHERE text IS NOT NULL
),
fr AS (
  SELECT doc_id, g.k AS frame_idx,
         CAST(list_sum(list_transform(generate_series(1, {_SCENE_FRAME}),
           j -> (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_SCENE_FRAME * 2}) * (g.k - 1) + 2 * j - 1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_SCENE_FRAME * 2}) * (g.k - 1) + 2 * j AS INT), 1)) - 1)
         )) AS BIGINT) AS luma
  FROM f, LATERAL (SELECT unnest(generate_series(1, n_frames)) AS k) g
  WHERE n_frames >= 1
),
cuts AS (
  SELECT doc_id, (frame_idx - 1) * {_SCENE_FRAME} AS pos
  FROM (SELECT doc_id, frame_idx,
               abs(luma - lag(luma) OVER (PARTITION BY doc_id
                                          ORDER BY frame_idx)) AS jump
        FROM fr)
  WHERE jump > {_SCENE_TH}
),
au AS (
  SELECT doc_id, g.k AS win_idx,
         CAST(list_sum(list_transform(generate_series(1, {_AV_WIN}),
           j -> (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_AV_WIN * 2}) * (g.k - 1) + 2 * j - 1 AS INT), 1)) - 1) * 16
              + (strpos('0123456789ABCDEF',
                   substr(ph, CAST(({_AV_WIN * 2}) * (g.k - 1) + 2 * j AS INT), 1)) - 1)
         )) AS BIGINT) AS energy
  FROM f, LATERAL (SELECT unnest(generate_series(1, n_windows)) AS k) g
  WHERE n_frames >= 1
),
voiced AS (
  SELECT doc_id, (win_idx - 1) * {_AV_WIN} AS pos
  FROM au WHERE energy > {_AV_TH}
),
ev AS (
  SELECT doc_id, pos, 1 AS is_cut FROM cuts
  UNION ALL
  SELECT doc_id, pos, 0 AS is_cut FROM voiced
),
scn AS (
  SELECT doc_id, is_cut,
         CAST(SUM(is_cut) OVER (PARTITION BY doc_id
                                ORDER BY pos, is_cut DESC) AS BIGINT) AS scene
  FROM ev
),
per_scene AS (
  SELECT doc_id, scene, CAST(COUNT(*) AS BIGINT) AS nv
  FROM scn WHERE is_cut = 0 GROUP BY doc_id, scene
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT scene) AS BIGINT) AS n_voiced_scenes,
         CAST(MAX(nv) AS BIGINT) AS max_voiced_in_scene,
         CAST(SUM(nv) AS BIGINT) AS n_voiced
  FROM per_scene GROUP BY doc_id
),
nc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cuts FROM cuts GROUP BY doc_id
)
SELECT f.doc_id,
       COALESCE(nc.n_cuts, 0) AS n_cuts,
       COALESCE(agg.n_voiced, 0) AS n_voiced,
       COALESCE(agg.n_voiced_scenes, 0) AS n_voiced_scenes,
       COALESCE(agg.max_voiced_in_scene, 0) AS max_voiced_in_scene
FROM f LEFT JOIN nc USING (doc_id) LEFT JOIN agg USING (doc_id)
WHERE f.n_frames >= 1
ORDER BY f.doc_id
""",
    tier="T2",
)
def multimodal_av_sync(spark, sf_dir):
    """Cross-modal alignment of the two synthetic tracks carved from the
    SAME payload: the video track (16-byte frames, scene cuts where
    |Δluma| > 128 — multimodal_scene_cuts' definition verbatim) and an
    audio track (8-byte windows, voiced where byte-energy > 800 —
    multimodal_audio_vad's shape). Each voiced window is assigned to the
    scene containing its byte offset by a SWEEP: scene = number of cuts at
    or before the window's position (cuts sort before voices at equal
    offsets). Emits per asset: cut/voiced counts, how many scenes contain
    voice, and the densest scene — the audio-visual alignment table a
    curation pipeline uses to pick training clips with speech.

    ORACLE-CHECKED: both feature tracks are exact integer byte sums (hex
    fold on the DuckDB side), the scene assignment is a cumulative count
    over the merged (pos, is_cut DESC)-ordered event list — the
    win_concurrency_sweep discipline — and every output is an int64 count.
    The Spark side computes the same sweep per asset with vectorized
    searchsorted inside ONE mapInPandas pass.

    Scale note: map-only per asset (no shuffle; both tracks and the sweep
    are in-row numpy over one payload); a real demuxer/decoder slots into
    the same batch loop. The SQL spelling shows the distributed fallback:
    merged event list + one windowed cumulative sum, shuffling only
    (asset, pos, flag) triples.
    """
    import numpy as np
    import pandas as pd

    d = load(spark, sf_dir, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )

    def sync(it):
        for pdf in it:
            out = {"doc_id": [], "n_cuts": [], "n_voiced": [],
                   "n_voiced_scenes": [], "max_voiced_in_scene": []}
            for doc_id, s in zip(pdf["doc_id"], pdf["text"]):
                b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
                nf = len(b) // _SCENE_FRAME
                if nf < 1:
                    continue
                luma = (
                    b[: nf * _SCENE_FRAME]
                    .reshape(nf, _SCENE_FRAME)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                jump = np.abs(np.diff(luma))
                cut_pos = (np.nonzero(jump > _SCENE_TH)[0] + 1) * _SCENE_FRAME
                nw = len(b) // _AV_WIN
                energy = (
                    b[: nw * _AV_WIN]
                    .reshape(nw, _AV_WIN)
                    .astype(np.int64)
                    .sum(axis=1)
                )
                voiced_pos = np.nonzero(energy > _AV_TH)[0] * _AV_WIN
                scenes = np.searchsorted(cut_pos, voiced_pos, side="right")
                out["doc_id"].append(doc_id)
                out["n_cuts"].append(len(cut_pos))
                out["n_voiced"].append(len(voiced_pos))
                if len(voiced_pos):
                    counts = np.bincount(scenes)
                    out["n_voiced_scenes"].append(int((counts > 0).sum()))
                    out["max_voiced_in_scene"].append(int(counts.max()))
                else:
                    out["n_voiced_scenes"].append(0)
                    out["max_voiced_in_scene"].append(0)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return d.mapInPandas(
        sync,
        "doc_id long, n_cuts long, n_voiced long, "
        "n_voiced_scenes long, max_voiced_in_scene long",
    ).orderBy("doc_id")


_IMG_HIST_SQL = """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         CAST(octet_length(encode(text)) AS BIGINT) AS n
  FROM documents WHERE text IS NOT NULL AND length(text) > 0
),
px AS (
  -- intensity bin of byte i = its HIGH nibble = hex char 2i-1 (16 bins)
  SELECT doc_id, n,
         unnest(list_transform(generate_series(CAST(1 AS BIGINT), n),
           i -> CAST(strpos('0123456789ABCDEF', substr(hx, 2 * i - 1, 1)) - 1
                     AS BIGINT))) AS bin
  FROM h
)
SELECT doc_id, bin,
       CAST(COUNT(*) AS BIGINT) AS cnt,
       CAST(COUNT(*) * 1000000 // MAX(n) AS BIGINT) AS share_micro
FROM px
GROUP BY doc_id, bin
"""


@register("multimodal_image_histogram", oracle=_IMG_HIST_SQL, tier="T2")
def multimodal_image_histogram(spark, sf_dir):
    """Per-image 16-bin intensity histogram over an opaque binary payload
    (bytes as 8-bit pixels, bin = high nibble) — the exposure/contrast
    profile an image-curation pipeline computes before quality gating;
    long-format (doc_id, bin, cnt, share) so downstream dedup can compare
    histograms as distributions.

    Determinism: PURE int64 — the bin of byte i is literally hex char
    2i−1 of hex(payload) (identical for any UTF-8 payload in both engines;
    the [[multimodal_audio_features]] hex-pair recipe, high nibble only),
    counts are exact, shares one non-negative micro `//`. Empty/NULL
    payloads are excluded on both sides.

    Scale note: whole pipeline is JVM codegen (hex + in-row transform +
    explode) — no Python; the explode emits (doc_id, bin) two-int rows and
    the hash aggregate map-side-combines each partition to ≤16 rows per
    doc before the shuffle, so the wide stage is O(docs·16), not
    O(corpus bytes). A real decoder drops in at the payload column
    (the injectable-seam contract of this family).
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length("text") > 0)
    )
    h = d.select(
        "doc_id",
        F.hex(F.encode("text", "utf-8")).alias("hx"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n"),
    )
    px = h.select(
        "doc_id",
        "n",
        F.explode(
            F.expr(
                """transform(sequence(CAST(1 AS BIGINT), n),
                   i -> CAST(conv(substr(hx, CAST(2 * i - 1 AS INT), 1), 16, 10)
                             AS BIGINT))"""
            )
        ).alias("bin"),
    )
    return px.groupBy("doc_id", "bin").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.expr("CAST(COUNT(1) * 1000000 DIV MAX(n) AS BIGINT)").alias(
            "share_micro"
        ),
    )
