"""Real byte-level media-header parsing (no decode libraries): magic-byte
MIME sniffing + PNG/GIF dims in pure Catalyst; JPEG segment walk + WAV fmt
chunk in the Arrow metadata extractor."""

import struct

import pytest

from pyspark.sql import functions as F


def make_png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0) + b"\x00" * 8)


def make_gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 8


def make_jpeg(w, h):
    # SOI + COM segment (skipped by the walker) + SOF0 + EOI
    com = b"\xff\xfe" + struct.pack(">H", 6) + b"test"
    sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
           + struct.pack(">HH", h, w) + b"\x01\x11\x00")
    return b"\xff\xd8\xff" + com[1:] + sof + b"\xff\xd9"


def make_wav(rate, channels):
    fmt = (b"fmt " + struct.pack("<I", 16)
           + struct.pack("<HHIIHH", 1, channels, rate, rate * 2, 2, 16))
    body = b"WAVE" + fmt + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", make_png(640, 480)),
        (2, "image", make_gif(320, 200)),
        (3, "image", make_jpeg(1024, 768)),
        (4, "audio", make_wav(44100, 2)),
        (5, "audio", b"ID3\x04\x00" + b"\x00" * 20),
        (6, "video", b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16),
        (7, "blob", b"\x01\x02\x03\x04" * 8),
    ]
    return spark.createDataFrame(rows,
                                 "media_id long, kind string, payload binary")


def test_sniff_mime_catalyst(media):
    from outliertree_spark.operators.multimodal import sniff_mime_expr
    got = {r.media_id: r.mime for r in
           media.select("media_id", sniff_mime_expr().alias("mime")).collect()}
    assert got == {1: "image/png", 2: "image/gif", 3: "image/jpeg",
                   4: "audio/wav", 5: "audio/mpeg", 6: "video/mp4",
                   7: "application/octet-stream"}


def test_dims_catalyst_match_python_parser(media):
    from outliertree_spark.operators.multimodal import (
        gif_dims_expr, parse_header, png_dims_expr, sniff_mime_expr)
    rows = media.select(
        "media_id", "payload", sniff_mime_expr().alias("mime"),
        png_dims_expr().alias("png"), gif_dims_expr().alias("gif")).collect()
    for r in rows:
        meta = parse_header(bytes(r.payload))
        assert meta["mime"] == r.mime
        if r.mime == "image/png":
            assert (r.png.width, r.png.height) == (640, 480) \
                == (meta["width"], meta["height"])
        if r.mime == "image/gif":
            assert (r.gif.width, r.gif.height) == (320, 200) \
                == (meta["width"], meta["height"])


def test_media_metadata_arrow(media):
    from outliertree_spark.operators.multimodal import media_metadata
    out = {r.media_id: r for r in media_metadata(media).collect()}
    assert (out[3].width, out[3].height) == (1024, 768)        # JPEG SOF
    assert (out[4].sample_rate_hz, out[4].n_channels) == (44100, 2)
    assert out[7].mime == "application/octet-stream"
    assert out[1].n_bytes == len(make_png(640, 480))


def test_plan_of_sniff_is_python_free(media):
    from outliertree_spark.operators.multimodal import (
        png_dims_expr, sniff_mime_expr)
    df = media.select(sniff_mime_expr().alias("m"), png_dims_expr().alias("d"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan
