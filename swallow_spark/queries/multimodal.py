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


@register(
    "multimodal_audio_features",
    oracle=f"""
WITH codes AS (
  SELECT doc_id,
         list_transform(generate_series(1, length(text)),
                        i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT)) AS cs
  FROM documents
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
    Arrow batching cannot change the result — oracle-checked)."""
    import numpy as np
    import pandas as pd

    def extract(batches):
        for pdf in batches:
            feats = {"doc_id": [], "n_samples": [], "mean_amp": [], "rms": [], "peak": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w = np.frombuffer(bytes(payload), dtype=np.uint8).astype(np.int64)
                n = len(w)
                s, s2 = int(w.sum()), int((w * w).sum())
                feats["doc_id"].append(doc_id)
                feats["n_samples"].append(n)
                feats["mean_amp"].append(np.floor(float(s) / n * 10000 + 0.5) / 10000)
                feats["rms"].append(
                    np.floor(np.sqrt(float(s2) / n) * 10000 + 0.5) / 10000
                )
                feats["peak"].append(int(w.max()))
            yield pd.DataFrame(feats)

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        extract, "doc_id long, n_samples long, mean_amp double, rms double, peak long"
    )


@register("multimodal_frame_sample", oracle=None, tier="T3")
def multimodal_frame_sample(spark, sf_dir):
    """Video-style frame sampling: treat the payload as fixed-size 16-byte
    frames, keep every 4th frame (stride sampling), emit one row per kept
    frame with its offset and bytes — the fan-out shape a real video
    pipeline (decode → sample → per-frame model) uses.

    Real plumbing, stub decode: frames are byte slices; a real decoder
    (pyav/ffmpeg) would plug into the same mapInPandas signature.
    """
    import pandas as pd

    FRAME, STRIDE = 16, 4

    def sample(batches):
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "offset": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = len(b) // FRAME
                for fi in range(0, n_frames, STRIDE):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(fi)
                    rows["offset"].append(fi * FRAME)
                    rows["frame"].append(b[fi * FRAME : (fi + 1) * FRAME])
            yield pd.DataFrame(rows)

    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )
    return d.mapInPandas(
        sample, "doc_id long, frame_idx int, offset long, frame binary"
    )


@register("multimodal_image_tiles", oracle=None, tier="T3")
def multimodal_image_tiles(spark, sf_dir):
    """Image-style tiling entirely in JVM expressions: slice the binary
    payload into 64-byte tiles with posexplode — fan-out without Python.

    Stub decode (tiles are byte ranges, a real impl tiles pixel grids); the
    partitioning story is the point: tiles shuffle by (doc, tile) so
    per-tile feature extraction parallelizes beyond per-image."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.length("text").alias("n_bytes"),
    )
    TILE = 64
    # substring with a dynamic start needs the SQL lambda form
    tiles = F.expr(
        f"transform(sequence(1, greatest(cast(n_bytes / {TILE} as int), 1)), "
        f"i -> substring(payload, (i - 1) * {TILE} + 1, {TILE}))"
    )
    return d.select(
        "doc_id", F.posexplode(tiles).alias("tile_idx", "tile")
    ).withColumn("tile_len", F.length("tile").cast("long"))
