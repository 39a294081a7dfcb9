"""Real-decoder smoke for the multimodal plumbing (VERDICT r5 #7).

The container ships no image codec, so the multimodal gates run on the
deterministic ``fake_decode`` stand-in. Where Pillow IS importable
(self-skip otherwise — the delta-spark live-MERGE test pattern), this
exercises the same codec-injection contract with a REAL decoder over a
REAL 2x2 grayscale PNG and asserts against hand-computed values, closing
the "fakes only" caveat on any host that has the library.

The PNG bytes are built with stdlib zlib/struct (no Pillow needed to
CONSTRUCT the fixture), so the fixture is identical everywhere and the
expected pixel values are exact: a 2x2 grayscale image with pixel rows
(0, 85) / (170, 255).
"""

import struct
import zlib

import pytest

PIL = pytest.importorskip("PIL")

from database_replicator_spark.operators.multimodal import (  # noqa: E402
    extract_features,
    media_phash,
    media_table,
)

#: row-major pixel values of the fixture image
PIXELS = [0, 85, 170, 255]


def png_2x2_gray() -> bytes:
    """Minimal valid 2x2 8-bit grayscale PNG with pixels PIXELS."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)  # 2x2, 8-bit, gray
    # each scanline: filter byte 0 + pixel bytes
    raw = bytes([0, PIXELS[0], PIXELS[1], 0, PIXELS[2], PIXELS[3]])
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def pil_decoder(payload: bytes) -> list[float]:
    """The real-codec injection: grayscale pixels of the decoded image,
    row-major — for a 2x2 source this is aHash's downscaled grid
    directly (NEAREST keeps the values bit-exact)."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    img = img.resize((2, 2), Image.NEAREST)
    return [float(v) for v in img.getdata()]


class TestRealCodec:
    def test_extract_features_real_png(self, spark):
        import hashlib

        payload = png_2x2_gray()
        df = spark.createDataFrame([(1, bytearray(payload))], "id long, img binary")
        media = media_table(df, "id", "img", "image/png")
        row = extract_features(media, decoder=pil_decoder, feature_dim=4).first()
        assert row["mime"] == "image/png"
        assert row["n_bytes"] == len(payload)
        assert row["fingerprint"] == hashlib.md5(payload).hexdigest()
        assert row["feature"] == [float(v) for v in PIXELS]

    def test_media_phash_real_png(self, spark):
        # mean = 127.5; bits set where pixel > mean: positions 2 (170)
        # and 3 (255) -> 2^2 + 2^3 = 12
        payload = png_2x2_gray()
        df = spark.createDataFrame([(1, bytearray(payload))], "id long, img binary")
        media = media_table(df, "id", "img", "image/png")
        row = media_phash(media, decoder=pil_decoder, dim=4).first()
        assert row["phash"] == 12
