"""Image-header parser tests: known-good fixture bytes (hand-verified
against the published byte layouts), synthesized round-trips, and
adversarial truncation/garbage.  parse_image_dims is pure Python — no
Spark needed except for the synth round-trip test at the end."""

import struct

import pytest

from jsonld_spark.functions.multimodal import parse_image_dims

# The canonical 1x1 transparent GIF (the web's tracking-pixel bytes).
GIF_1x1 = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00\x00\x00\x00\x00\x00\x00"
    b"!\xf9\x04\x01\x00\x00\x00\x00,\x00\x00\x00\x00\x01\x00\x01\x00"
    b"\x00\x02\x02D\x01\x00;"
)

# Minimal valid 1x1 PNG (signature + IHDR for 1x1, bit depth 8, RGBA).
PNG_1x1 = (
    b"\x89PNG\r\n\x1a\n"
    b"\x00\x00\x00\x0dIHDR"
    b"\x00\x00\x00\x01\x00\x00\x00\x01"
    b"\x08\x06\x00\x00\x00\x1f\x15\xc4\x89"
)


def _jpeg(w, h, pre_segments=b""):
    # marker, len=0x11, precision, H, W, ncomp, 9 component bytes
    sof = b"\xff\xc0\x00\x11\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    return b"\xff\xd8" + pre_segments + sof


class TestKnownFixtures:
    def test_gif_1x1(self):
        assert parse_image_dims(GIF_1x1) == ("gif", 1, 1)

    def test_png_1x1(self):
        assert parse_image_dims(PNG_1x1) == ("png", 1, 1)

    def test_gif87a(self):
        b = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\x00"
        assert parse_image_dims(b) == ("gif", 320, 200)

    def test_png_big_dims(self):
        b = (
            b"\x89PNG\r\n\x1a\n\x00\x00\x00\x0dIHDR"
            + struct.pack(">II", 70000, 123456)
            + b"\x08\x02\x00\x00\x00"
        )
        assert parse_image_dims(b) == ("png", 70000, 123456)


class TestJpegMarkerScan:
    def test_bare_sof0(self):
        assert parse_image_dims(_jpeg(640, 480)) == ("jpeg", 640, 480)

    def test_app0_then_sof(self):
        app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
        assert parse_image_dims(_jpeg(1024, 768, app0)) == ("jpeg", 1024, 768)

    def test_dht_not_mistaken_for_sof(self):
        # DHT (0xC4) sits in the SOF numeric range but is NOT a frame
        # header; the scan must skip it and find the real SOF2 after
        dht = b"\xff\xc4\x00\x05\x00\x01\x02"
        prog = b"\xff\xc2\x00\x11\x08" + struct.pack(">HH", 99, 77) + b"\x03" + b"\x00" * 9
        assert parse_image_dims(b"\xff\xd8" + dht + prog) == ("jpeg", 77, 99)

    def test_fill_bytes_and_rst_skipped(self):
        fill = b"\xff\xff"  # fill byte then marker
        rst = b"\xff\xd3"   # standalone RST3: no length field
        assert parse_image_dims(_jpeg(5, 7, fill + rst)) == ("jpeg", 5, 7)

    def test_truncated_sof_returns_none(self):
        assert parse_image_dims(b"\xff\xd8\xff\xc0\x00\x11\x08\x00") is None

    def test_lost_sync_returns_none(self):
        assert parse_image_dims(b"\xff\xd8junkjunkjunk") is None


class TestWebp:
    def test_vp8x(self):
        w, h = 800, 600
        b = (
            b"RIFF\x24\x00\x00\x00WEBPVP8X\x0a\x00\x00\x00\x00\x00\x00\x00"
            + struct.pack("<I", w - 1)[:3]
            + struct.pack("<I", h - 1)[:3]
        )
        assert parse_image_dims(b) == ("webp", 800, 600)

    def test_vp8_lossy(self):
        w, h = 550, 368
        b = (
            b"RIFF\x24\x00\x00\x00WEBPVP8 \x0a\x00\x00\x00"
            + b"\x00\x00\x00"            # frame tag
            + b"\x9d\x01\x2a"            # start code
            + struct.pack("<HH", w, h)
        )
        assert parse_image_dims(b) == ("webp", 550, 368)

    def test_vp8l_lossless(self):
        w, h = 300, 200
        bits = (w - 1) | ((h - 1) << 14)
        b = (
            b"RIFF\x24\x00\x00\x00WEBPVP8L\x0a\x00\x00\x00"
            + b"\x2f" + struct.pack("<I", bits)
        )
        assert parse_image_dims(b) == ("webp", 300, 200)

    def test_bad_start_code_returns_none(self):
        b = b"RIFF\x24\x00\x00\x00WEBPVP8 \x0a\x00\x00\x00\x00\x00\x00ABC\x00\x00\x00\x00"
        assert parse_image_dims(b) is None


class TestNonImages:
    @pytest.mark.parametrize(
        "b",
        [
            b"",
            b"hello world this is text",
            b"\x89PNG\r\n\x1a\x00 corrupted signature....",
            b"GIF89",      # truncated magic
            b"RIFF\x00\x00\x00\x00WAVE" + b"\x00" * 20,  # RIFF but not WEBP
            b"\xff\xd8",   # SOI only
        ],
    )
    def test_none(self, b):
        assert parse_image_dims(b) is None


def test_extract_features_mixed_payloads(spark):
    """Real dims for image payloads, fake dims + NULL format for text."""
    import hashlib

    from jsonld_spark.functions.multimodal import extract_features

    rows = [
        (1, PNG_1x1),
        (2, GIF_1x1),
        (3, _jpeg(12, 34)),
        (4, b"plain text payload"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_features(df).collect()}
    assert (got[1].format, got[1].width, got[1].height) == ("png", 1, 1)
    assert (got[2].format, got[2].width, got[2].height) == ("gif", 1, 1)
    assert (got[3].format, got[3].width, got[3].height) == ("jpeg", 12, 34)
    d4 = hashlib.md5(b"plain text payload").hexdigest()
    assert got[4].format is None
    assert got[4].width == 64 + int(d4[:2], 16)
    d5 = hashlib.md5(b"").hexdigest()
    assert got[5].format is None and got[5].n_bytes == 0
    assert got[5].digest == d5


def test_synth_round_trip(spark):
    """JVM-synthesized headers parse back to the doc_id-derived dims."""
    from jsonld_spark.functions.multimodal import (
        extract_features,
        synth_image_payloads,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(0, 40)] + [(995,), (1281,)], "doc_id long"
    )
    out = extract_features(synth_image_payloads(docs)).collect()
    fmts = {0: "png", 1: "gif", 2: "jpeg", 3: "webp"}
    for r in out:
        assert r.format == fmts[r.doc_id % 4], r
        assert r.width == 100 + r.doc_id % 1000, r
        assert r.height == 50 + r.doc_id % 700, r
