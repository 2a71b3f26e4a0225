"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` operators.

REAL decode (VERDICT r3 task 4): ``codec="ppm"`` is a pure-numpy decoder
for binary PPM (P6) — an uncompressed standard format, so no image
library is needed: parse the ASCII header, ``np.frombuffer`` the pixel
plane, emit dims + exact integer pixel sum. ``fake_media_ppm`` generates
VALID P6 blobs (real header + md5-derived pixel bytes), so the decoder
is exercised on actual pixels end-to-end and gate-checked against a
closed-form DuckDB twin of the generator.

``codec="real"`` still raises NotImplementedError — it marks where a
COMPRESSED codec (JPEG/PNG via PIL/libvips) would plug in; those
libraries are not in this container. ``codec="fake"`` keeps the original
synthetic-header path:
    b"IMG1" + width(4, big-endian) + height(4) + channels(1) + payload
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id LONG, kind STRING, media BINARY, width INT, height INT"
)
DECODED_SCHEMA = (
    "media_id LONG, width INT, height INT, channels INT, n_pixels LONG, "
    "payload_bytes LONG"
)


def fake_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from documents: one synthetic
    'image' per doc, dimensions a pure function of doc_id."""
    w = (F.col("doc_id") % 64 + 8).cast("int")
    h = (F.col("doc_id") % 48 + 6).cast("int")
    header = F.concat(
        F.lit(b"IMG1"),
        _be32(w),
        _be32(h),
        _int8(F.lit(3)),
        F.col("text").cast("binary"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        header.alias("media"),
        w.alias("width"),
        h.alias("height"),
    )


def _be32(col):
    """4-byte big-endian encoding of an int column, via JVM built-ins."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), 8, "0"))


def _int8(col):
    return F.unhex(F.lpad(F.hex(col.cast("long")), 2, "0"))


PPM_DECODED_SCHEMA = (
    "media_id LONG, width INT, height INT, channels INT, n_pixels LONG, "
    "pixel_sum LONG, mean_pixel DOUBLE"
)


def fake_media_ppm(docs: DataFrame) -> DataFrame:
    """(media_id, kind, media, width, height) — one VALID binary PPM (P6)
    image per document: header ``P6\\n<w> <h>\\n255\\n`` followed by
    exactly w·h·3 pixel bytes, the md5 hex digest of the doc's text
    repeated and truncated (deterministic, engine-reproducible — the
    DuckDB twin regenerates the same bytes in SQL). Dimensions are a pure
    function of doc_id, kept small (w ≤ 19, h ≤ 14) so the byte-explode
    oracle stays cheap at gate scale."""
    w = (F.col("doc_id") % 16 + 4).cast("int")
    h = (F.col("doc_id") % 12 + 3).cast("int")
    # pixel bytes as hex (2 chars/byte): md5 hex (32 chars) repeated past
    # w·h·3·2 chars, then cut to exactly that length
    px_hex = F.expr(
        "substring(repeat(md5(text), cast(ceil((((doc_id % 16 + 4) * "
        "(doc_id % 12 + 3) * 3 * 2)) / 32.0) as int)), 1, "
        "cast((doc_id % 16 + 4) * (doc_id % 12 + 3) * 3 * 2 as int))"
    )
    blob = F.concat(
        F.concat_ws(
            "", F.lit("P6\n"), w.cast("string"), F.lit(" "),
            h.cast("string"), F.lit("\n255\n"),
        ).cast("binary"),
        F.unhex(px_hex),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("ppm").alias("kind"),
        blob.alias("media"),
        w.alias("width"),
        h.alias("height"),
    )


def decode_image(media: DataFrame, codec: str = "fake") -> DataFrame:
    """Arrow-batched decode: binary → (dims, channels, pixel count).

    ``codec="ppm"`` REALLY decodes: pure-numpy binary-PPM (P6) parsing —
    ASCII header (width, height, maxval), then the uint8 pixel plane via
    ``np.frombuffer`` — returning dims, channel count, the exact integer
    sum of all pixel bytes, and the 6dp-rounded mean pixel value. Raises
    ValueError on a malformed header or truncated pixel plane.

    ``codec="real"`` marks where a COMPRESSED codec (PIL/libvips) would
    decode; unavailable in this container, so it raises
    NotImplementedError. ``codec="fake"`` parses the deterministic
    synthetic header — the batch shape, schema and partitioning are
    exactly what the codec paths use.
    """
    if codec == "real":
        raise NotImplementedError(
            "compressed image decoding needs PIL/libvips — not in this "
            "container; use codec='ppm' (pure-numpy, real pixels) or "
            "codec='fake' (synthetic header)"
        )
    if codec == "ppm":
        import re

        import numpy as np

        hdr_re = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")

        def ppm_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                out = {
                    "media_id": [], "width": [], "height": [],
                    "channels": [], "n_pixels": [], "pixel_sum": [],
                    "mean_pixel": [],
                }
                for mid, blob in zip(pdf["media_id"], pdf["media"]):
                    buf = bytes(blob)
                    m = hdr_re.match(buf)
                    if not m:
                        raise ValueError(
                            f"decode_image(ppm): bad P6 header, media_id={mid}"
                        )
                    w, h, maxval = (int(g) for g in m.groups())
                    if maxval > 255:
                        raise ValueError(
                            "decode_image(ppm): 16-bit maxval unsupported"
                        )
                    n = w * h * 3
                    px = np.frombuffer(buf, dtype=np.uint8, offset=m.end())
                    if px.size < n:
                        raise ValueError(
                            f"decode_image(ppm): truncated pixel plane, "
                            f"media_id={mid}"
                        )
                    s = int(px[:n].sum(dtype=np.int64))
                    out["media_id"].append(mid)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(3)
                    out["n_pixels"].append(w * h)
                    out["pixel_sum"].append(s)
                    out["mean_pixel"].append(round(s / n, 6))
                yield pd.DataFrame(out)

        return media.mapInPandas(ppm_batches, schema=PPM_DECODED_SCHEMA)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = pdf["media"]
            width = blobs.map(lambda b: struct.unpack(">I", b[4:8])[0])
            height = blobs.map(lambda b: struct.unpack(">I", b[8:12])[0])
            channels = blobs.map(lambda b: b[12])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width.astype("int32"),
                    "height": height.astype("int32"),
                    "channels": channels.astype("int32"),
                    "n_pixels": (width * height).astype("int64"),
                    "payload_bytes": blobs.map(len).astype("int64") - 13,
                }
            )

    return media.mapInPandas(batches, schema=DECODED_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) for every
    n-th synthetic 'frame' (payload_bytes // 256 frames per media). The
    decode of each frame is the stubbed step; the fan-out join shape is
    the real thing."""
    n_frames = (F.octet_length("media") - F.lit(13)) / F.lit(256)
    return media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.floor(n_frames).cast("int") - 1, F.lit(0)),
                F.lit(every_n),
            )
        ).alias("frame_no"),
    )
