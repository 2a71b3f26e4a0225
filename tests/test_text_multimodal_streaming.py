"""Text functions, multimodal plumbing, streaming window agg."""

import pytest
from pyspark.sql import functions as F

from ps_projekt_pagerank_spark.functions import text as tx
from ps_projekt_pagerank_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat is on the mat."),
            (1, "je na se za da, ki so ne pri!"),
            (2, "word"),
        ],
        "doc_id LONG, text STRING",
    )


def test_quality_features(docs):
    rows = {r["doc_id"]: r for r in tx.quality_features(docs).collect()}
    assert rows[0]["n_tokens"] == 6
    assert rows[0]["n_punct"] == 1
    # 'the' x2 + 'is' = 3 EN stopword hits of 6 tokens
    assert rows[0]["stopword_ratio"] == 0.5
    assert rows[2]["n_tokens"] == 1 and rows[2]["n_punct"] == 0


def test_lang_id(docs):
    rows = {r["doc_id"]: r["lang_pred"] for r in tx.lang_id(docs).collect()}
    assert rows[0] == "en"
    assert rows[1] == "sl"
    assert rows[2] == "en"  # no hits → tie → en


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(0, "Hello   World"), (1, "hello world"), (2, " hello  world ")],
        "doc_id LONG, text STRING",
    )
    fps = [r[0] for r in df.select(tx.fingerprint("text")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_multimodal_decode_roundtrip(docs):
    media = mm.fake_media(docs)
    decoded = {r["media_id"]: r for r in mm.decode_image(media).collect()}
    for r in docs.collect():
        d = decoded[r["doc_id"]]
        assert d["width"] == r["doc_id"] % 64 + 8
        assert d["height"] == r["doc_id"] % 48 + 6
        assert d["channels"] == 3
        assert d["n_pixels"] == d["width"] * d["height"]
        assert d["payload_bytes"] == len(r["text"].encode("utf-8"))


def test_multimodal_real_codec_is_stubbed(docs):
    with pytest.raises(NotImplementedError):
        mm.decode_image(mm.fake_media(docs), codec="real")


def test_frame_sample(spark):
    docs = spark.createDataFrame(
        [(0, "x" * 1000), (1, "y" * 100)], "doc_id LONG, text STRING"
    )
    frames = mm.frame_sample(mm.fake_media(docs), every_n=1).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r["frame_no"])
    assert sorted(by_id[0]) == list(range(1000 // 256))  # 3 frames
    assert by_id[1] == [0]


def test_streaming_matches_batch(spark, tmp_path):
    import datetime as dt

    from ps_projekt_pagerank_spark.streaming.events import (
        stream_windowed_event_agg,
        windowed_event_agg,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=37 * i), "click" if i % 2 else "view",
         float(i))
        for i in range(200)
    ]
    events = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    pdir = str(tmp_path / "events")
    events.write.parquet(pdir)

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_agg(spark.read.parquet(pdir)).collect()
    }
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in stream_windowed_event_agg(spark, pdir).collect()
    }
    assert batch == streamed
    assert len(batch) > 10


def test_streaming_dedup_first_seen(spark, tmp_path):
    import datetime as dt

    from ps_projekt_pagerank_spark.streaming.events import (
        stream_dedup_first_seen,
    )

    base = dt.datetime(2024, 1, 1)
    # 120 events over 40 distinct keys -> exactly one survivor per key
    rows = [
        (i, base + dt.timedelta(seconds=13 * i), f"k{i % 40}", float(i))
        for i in range(120)
    ]
    events = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    pdir = str(tmp_path / "events_dup")
    events.write.parquet(pdir)

    out = stream_dedup_first_seen(spark, pdir, ["event_type"]).collect()
    assert len(out) == 40
    assert sorted(r["event_type"] for r in out) == sorted(f"k{i}" for i in range(40))


def test_sessionized_gap_semantics(spark):
    import datetime as dt

    from ps_projekt_pagerank_spark.streaming.events import sessionized

    base = dt.datetime(2024, 1, 1)
    mins = lambda m: base + dt.timedelta(minutes=m)  # noqa: E731
    rows = [
        # user 1: gaps 10m, 29m59s, 30m-exactly -> all ONE session
        # (Spark session_window merges gap <= 30m; only > 30m splits)
        (0, mins(0), 1, "a", 1.0, "{}"),
        (1, mins(10), 1, "a", 2.0, "{}"),
        (2, mins(10) + dt.timedelta(minutes=29, seconds=59), 1, "a", 3.0, "{}"),
        (3, mins(10) + dt.timedelta(minutes=59, seconds=59), 1, "a", 4.0, "{}"),
        # user 2: single event
        (4, mins(5), 2, "b", 9.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, "
        "value DOUBLE, props STRING",
    )
    out = {
        (r["user_id"], r["session_start"]): (r["n_events"], r["sum_value"])
        for r in sessionized(events).collect()
    }
    epoch = lambda d: int(d.timestamp())  # noqa: E731
    assert out == {
        (1, epoch(mins(0))): (4, 10.0),
        (2, epoch(mins(5))): (1, 9.0),
    }


def test_trending_stream_matches_batch(spark, tmp_path):
    import datetime as dt

    from ps_projekt_pagerank_spark.streaming.events import (
        stream_trending_event_types,
        trending_event_types,
    )

    base = dt.datetime(2024, 1, 1)
    types = ["view", "click", "scroll", "error", "purchase"]
    rows = [
        (i, base + dt.timedelta(seconds=211 * i), types[i * i % 5],
         float(i))
        for i in range(300)
    ]
    events = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, event_type STRING, value DOUBLE"
    )
    pdir = str(tmp_path / "trend_events")
    events.write.parquet(pdir)

    batch = {
        (r["window_start"], r["rank_in_group"]): (r["event_type"], r["n_events"])
        for r in trending_event_types(
            spark.read.parquet(pdir), k=2
        ).collect()
    }
    streamed = {
        (r["window_start"], r["rank_in_group"]): (r["event_type"], r["n_events"])
        for r in stream_trending_event_types(spark, pdir, k=2).collect()
    }
    assert batch == streamed
    assert len(batch) > 10
    assert all(rk in (1, 2) for _, rk in batch)


def _py_ppm_blob(doc_id: int, text: str) -> tuple[bytes, int, int, int]:
    """independent Python oracle of fake_media_ppm: returns (blob, w, h,
    pixel_sum)."""
    import hashlib
    import math

    w = doc_id % 16 + 4
    h = doc_id % 12 + 3
    n = w * h * 3
    digest = hashlib.md5(text.encode()).hexdigest()
    hx = (digest * math.ceil(2 * n / 32))[: 2 * n]
    px = bytes.fromhex(hx)
    blob = f"P6\n{w} {h}\n255\n".encode() + px
    return blob, w, h, sum(px)


def test_ppm_generator_emits_valid_p6(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (18, "the quick brown fox"), (30, "abc")],
        "doc_id LONG, text STRING",
    )
    rows = {r["media_id"]: r for r in mm.fake_media_ppm(docs).collect()}
    for did, text in [(1, "hello world"), (18, "the quick brown fox"),
                      (30, "abc")]:
        blob, w, h, _ = _py_ppm_blob(did, text)
        assert bytes(rows[did]["media"]) == blob, did
        assert rows[did]["width"] == w and rows[did]["height"] == h


def test_ppm_decode_real_pixels(spark):
    docs = spark.createDataFrame(
        [(i, f"document number {i} with text") for i in range(25)],
        "doc_id LONG, text STRING",
    )
    media = mm.fake_media_ppm(docs)
    got = {r["media_id"]: r for r in
           mm.decode_image(media, codec="ppm").collect()}
    assert len(got) == 25
    for i in range(25):
        _, w, h, psum = _py_ppm_blob(i, f"document number {i} with text")
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["n_pixels"] == w * h
        assert r["pixel_sum"] == psum
        assert r["mean_pixel"] == round(psum / (w * h * 3), 6)


def test_ppm_decode_rejects_garbage(spark):
    import pytest as _pytest

    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"NOTAPPM...."), 4, 3)],
        "media_id LONG, kind STRING, media BINARY, width INT, height INT",
    )
    with _pytest.raises(Exception, match="bad P6 header"):
        mm.decode_image(bad, codec="ppm").collect()


def test_ppm_decode_rejects_truncated(spark):
    import pytest as _pytest

    blob, _, _, _ = _py_ppm_blob(1, "hello world")
    trunc = bytearray(blob[:-5])
    bad = spark.createDataFrame(
        [(1, "image", trunc, 4, 3)],
        "media_id LONG, kind STRING, media BINARY, width INT, height INT",
    )
    with _pytest.raises(Exception, match="truncated pixel plane"):
        mm.decode_image(bad, codec="ppm").collect()


# ----------------------------------------------------------- PNG codec
def _py_png_plane(doc_id: int, text: str):
    """independent oracle of fake_media_png's pixel plane: (w, h, raw)."""
    import hashlib
    import math

    import numpy as np

    w = doc_id % 13 + 5
    h = doc_id % 9 + 4
    n = w * h * 3
    digest = hashlib.md5(text.encode()).hexdigest()
    hx = (digest * math.ceil(2 * n / 32))[: 2 * n]
    return w, h, np.frombuffer(bytes.fromhex(hx), dtype=np.uint8).reshape(
        h, w * 3
    )


def test_png_decode_real_compressed_pixels(spark):
    """fake_media_png emits REAL deflate-compressed, CRC'd, filtered
    PNGs; decode_image(png) must inflate + unfilter back to the exact
    md5 plane."""
    import numpy as np

    docs = spark.createDataFrame(
        [(i, f"png document {i} body") for i in range(20)],
        "doc_id LONG, text STRING",
    )
    media = mm.fake_media_png(docs)
    got = {r["media_id"]: r for r in
           mm.decode_image(media, codec="png").collect()}
    assert len(got) == 20
    for i in range(20):
        w, h, raw = _py_png_plane(i, f"png document {i} body")
        r = got[i]
        psum = int(raw.sum(dtype=np.int64))
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert r["n_pixels"] == w * h
        assert r["pixel_sum"] == psum
        assert r["mean_pixel"] == round(psum / (w * h * 3), 6)


def test_png_blob_is_genuinely_compressed_and_valid(spark):
    """The blob must carry the PNG signature, CRC-valid chunks, and a
    deflate stream (not raw pixels); local _png_decode returns the
    exact plane."""
    import numpy as np

    docs = spark.createDataFrame(
        [(7, "seven"), (11, "eleven elves")], "doc_id LONG, text STRING"
    )
    rows = {r["media_id"]: bytes(r["media"])
            for r in mm.fake_media_png(docs).collect()}
    for did, text in [(7, "seven"), (11, "eleven elves")]:
        blob = rows[did]
        assert blob[:8] == b"\x89PNG\r\n\x1a\n"
        w, h, raw = mm._png_decode(blob)
        ew, eh, eraw = _py_png_plane(did, text)
        assert (w, h) == (ew, eh)
        assert np.array_equal(raw, eraw)


def test_png_decode_average_and_paeth_filters():
    """The two filter types the generator never emits (3 Average,
    4 Paeth) must still decode: filter a known image with an
    independent encoder implementation and check exact recovery."""
    import struct as _struct
    import zlib

    import numpy as np

    rng = np.random.default_rng(5)
    w, h = 6, 4
    raw = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8)
    lines = []
    prior = np.zeros(w * 3, dtype=np.int32)
    for r in range(h):
        row = raw[r].astype(np.int32)
        ftype = 3 if r % 2 == 0 else 4
        filt = np.zeros(w * 3, dtype=np.int32)
        for i in range(w * 3):
            a = int(row[i - 3]) if i >= 3 else 0
            b = int(prior[i])
            if ftype == 3:
                pred = (a + b) // 2
            else:
                c = int(prior[i - 3]) if i >= 3 else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            filt[i] = (row[i] - pred) % 256
        lines.append(bytes([ftype]) + filt.astype(np.uint8).tobytes())
        prior = row
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        b"\x89PNG\r\n\x1a\n"
        + mm._png_pack(b"IHDR", ihdr)
        + mm._png_pack(b"IDAT", zlib.compress(b"".join(lines)))
        + mm._png_pack(b"IEND", b"")
    )
    dw, dh, got = mm._png_decode(blob)
    assert (dw, dh) == (w, h)
    assert np.array_equal(got, raw)


def test_png_decode_rejects_bad_signature_and_crc():
    import struct as _struct
    import zlib

    import numpy as np
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bad PNG signature"):
        mm._png_decode(b"NOTAPNG.........")
    raw = np.zeros((2, 9), dtype=np.uint8)
    blob = bytearray(mm._png_encode(raw, 3, 2))
    # corrupt one IDAT payload byte without fixing the CRC
    idx = blob.index(b"IDAT") + 4
    blob[idx + 2] ^= 0xFF
    with _pytest.raises(ValueError, match="bad CRC"):
        mm._png_decode(bytes(blob))
