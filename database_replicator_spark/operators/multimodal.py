"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Design for the 100 TB training-data case: media payloads are opaque
``binary`` columns (or object-store URIs) with a typed metadata struct
(mime, width/height/duration, codec). Decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so the
heavy per-item work is vectorized per partition and never touches the
driver; partitioning guidance is bytes-per-partition, not rows
(`spark.sql.files.maxPartitionBytes` against payload size).

The actual codec work needs libraries this container does not ship
(Pillow/ffmpeg/torchaudio). Per the build contract those steps are STUBBED:
``decode_image_batch`` raises NotImplementedError unless a decoder is
injected, and ``fake_decode`` provides the deterministic stand-in used by
tests and the oracle-checked query — the Spark-side plumbing (schemas,
batch shapes, UDF signatures) is real.

Analytics on decoded media (round 10): near-dup fingerprints for all
three modalities, each feeding the shared banded-hamming pair join
(:func:`phash_pairs`) and, from there, the text tier's cluster/survivor
machinery — images via :func:`media_phash` (aHash), :func:`media_dhash`
(gradient sign), and :func:`media_dct_phash` (DCT, the only
non-SQL-expressible one); video via :func:`video_phash_signature`
(frame-sampled temporal signature); audio via :func:`audio_fingerprint`
(Haitsma-Kalker energy-landscape bits).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The Arrow-scan closures below capture module-level functions (the
# decoders, fake_* stand-ins): ship them BY VALUE inside the task so a
# driver whose workers cannot import this package (vanilla session from
# an arbitrary cwd — the kll.py lesson) still runs every media stage.
def _register_by_value() -> None:
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_by_value()


#: canonical media metadata struct
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_SCHEMA = (
    "id long, mime string, n_bytes long, fingerprint string, feature array<float>"
)


def media_table(
    df: DataFrame, id_col: str, payload_col: str, mime: str
) -> DataFrame:
    """Normalize to the canonical media layout: (id, payload binary, meta
    struct). Metadata that needs decoding stays NULL until a decode stage
    fills it."""
    payload = F.col(payload_col).cast("binary")
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        payload.alias("payload"),
        meta.alias("meta"),
    )


def fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic decode stand-in: md5-derived pseudo-features.
    Replace with a real decoder (Pillow/ffmpeg) outside this container.

    Feature ``i`` is an independent draw from the payload digest:
    ``md5(hex(md5(payload)) + ':' + i)`` — a hex-string chain rather than
    raw digest bytes, so an engine without blob hashing (DuckDB's md5 is
    VARCHAR-only) can reproduce every feature for the oracle gates."""
    import hashlib

    base = hashlib.md5(payload).hexdigest()
    return [
        int(hashlib.md5(f"{base}:{i}".encode()).hexdigest()[:8], 16)
        / float(2**32)
        for i in range(dim)
    ]


def decode_bmp(payload: bytes) -> list[float]:
    """REAL image decoder for uncompressed BMP (BI_RGB, 8-bit paletted or
    24-bit BGR) — pure stdlib/numpy, no external codec, so the container's
    no-Pillow constraint no longer forces synthetic pixels: real BMP bytes
    decode to the actual pixel grid end-to-end in the sandbox.

    Layout parsed per the public BITMAPFILEHEADER/BITMAPINFOHEADER spec:
    pixel-array offset at byte 10, width/height/bpp/compression from the
    40-byte DIB at offset 14, rows padded to 4-byte boundaries and stored
    bottom-up (top-down when height is negative). 8-bit pixels map
    through the palette (grayscale = blue channel — identical to R/G for
    gray palettes); 24-bit BGR maps to the exact channel mean. Returns
    row-major top-down grayscale floats, the contract every hash family
    expects from :func:`extract_features` decoders."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    dib_size, width, height = struct.unpack_from("<Iii", payload, 14)
    if dib_size < 40:
        raise ValueError(f"unsupported BMP DIB header size {dib_size}")
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (8, 24):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    row_size = ((bpp * width + 31) // 32) * 4
    rows = []
    for r in range(height):
        src_r = r if top_down else height - 1 - r
        start = pix_off + src_r * row_size
        row = payload[start : start + row_size]
        if bpp == 8:
            palette = payload[14 + dib_size : pix_off]
            rows.extend(float(palette[4 * b]) for b in row[:width])
        else:
            px = row[: 3 * width]
            rows.extend(
                (px[i] + px[i + 1] + px[i + 2]) / 3.0
                for i in range(0, 3 * width, 3)
            )
    return rows


def bmp_prefix(width: int, height: int) -> bytes:
    """The constant header+DIB+palette prefix of an 8-bit grayscale BMP
    of the given dimensions (identity palette, bottom-up rows): fixture
    builders concat this literal with the padded pixel rows to mint REAL
    BMP files plan-side — the byte layout :func:`decode_bmp` parses."""
    import struct

    row_size = ((8 * width + 31) // 32) * 4
    pix_off = 14 + 40 + 256 * 4
    total = pix_off + row_size * height
    header = b"BM" + struct.pack("<IHHI", total, 0, 0, pix_off)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 8, 0,
                      row_size * height, 2835, 2835, 256, 0)
    palette = b"".join(bytes((i, i, i, 0)) for i in range(256))
    return header + dib + palette


def decode_wav(payload: bytes) -> list[float]:
    """REAL audio decoder for PCM WAV (RIFF/WAVE, 8-bit unsigned or
    16-bit signed LE, any channel count) — pure stdlib, the audio twin of
    :func:`decode_bmp`. Walks the RIFF chunk list (not fixed offsets —
    real encoders emit LIST/fact chunks before data), reads the sample
    format from ``fmt ``, and returns mono float samples (multi-channel
    downmixed by exact per-frame mean)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (csz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + csz]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + csz + (csz & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, channels, _rate, _brate, _align, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if bits == 8:
        samples = [float(b) for b in data]
    elif bits == 16:
        n = len(data) // 2
        samples = [float(v) for v in struct.unpack(f"<{n}h", data[: 2 * n])]
    else:
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if channels > 1:
        frames = len(samples) // channels
        samples = [
            sum(samples[i * channels : (i + 1) * channels]) / channels
            for i in range(frames)
        ]
    return samples


def wav_prefix(n_samples: int, rate: int = 8000) -> bytes:
    """The constant RIFF/fmt/data prefix of an 8-bit mono PCM WAV with
    ``n_samples`` samples — fixture builders concat this with raw sample
    bytes to mint real WAV files plan-side."""
    import struct

    return (
        b"RIFF"
        + struct.pack("<I", 36 + n_samples)
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate, 1, 8)
        + b"data"
        + struct.pack("<I", n_samples)
    )


def _lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decompression (public spec: GIF89a appendix F /
    Welch 1984): LSB-first variable-width codes starting at
    ``min_code_size+1`` bits, CLEAR resets the table, widths grow when
    the NEXT table slot would not fit, capped at 12 bits."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: int | None = None
    acc = nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return bytes(out)  # tolerated: stream ended without EOI
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = table[: eoi + 1]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt LZW stream (first code not literal)")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):  # the KwKwK case
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("corrupt LZW stream (code beyond table)")
            out += entry
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        prev = code


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression — the exact inverse discipline of
    :func:`_lzw_decode`: the encoder grows its code width when its table
    counter passes ``2^W + 1`` (one later than the decoder's ``== 2^W``
    rule, because the decoder's table lags the encoder's by one entry —
    the classic matched pair). Round-trip identity is property-tested."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    bits = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            bits.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, code_size)
    if data:
        w = data[:1]
        for i in range(1, len(data)):
            c = data[i : i + 1]
            if w + c in table:
                w += c
                continue
            emit(table[w], code_size)
            if next_code <= 4095:
                table[w + c] = next_code
                next_code += 1
                if next_code == (1 << code_size) + 1 and code_size < 12:
                    code_size += 1
            w = c
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        bits.append(acc & 0xFF)
    return bytes(bits)


def decode_gif(payload: bytes) -> list[float]:
    """REAL image decoder for GIF87a/89a (global 256-color palette,
    non-interlaced, first image frame) — the first COMPRESSED container
    to parse natively in-sandbox: header + logical screen descriptor,
    extension blocks skipped by sub-block walking, image descriptor, and
    a from-scratch LZW decompressor (:func:`_lzw_decode`). Pixel indices
    map through the palette (grayscale = red channel); returns row-major
    top-down floats, the same contract as :func:`decode_bmp`."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF87a/89a magic)")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    palette = b""
    if packed & 0x80:
        n_colors = 2 << (packed & 0x07)
        palette = payload[pos : pos + 3 * n_colors]
        pos += 3 * n_colors
    while pos < len(payload):
        block = payload[pos]
        if block == 0x21:  # extension: label byte + sub-blocks
            pos += 2
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, width, height, ipacked = struct.unpack_from(
                "<HHHHB", payload, pos + 1
            )
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF not supported")
            if ipacked & 0x80:  # local color table overrides global
                n_colors = 2 << (ipacked & 0x07)
                palette = payload[pos : pos + 3 * n_colors]
                pos += 3 * n_colors
            min_code_size = payload[pos]
            pos += 1
            stream = bytearray()
            while payload[pos]:
                n = payload[pos]
                stream += payload[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(bytes(stream), min_code_size)
            if len(idx) < width * height:
                raise ValueError("GIF pixel data short of width*height")
            # spec-legal foreign GIFs can carry a color table shorter
            # than 2^min_code_size (or none at all): validate the pixel
            # indices against the palette so the decoder keeps its
            # raise-ValueError-loudly contract instead of IndexError
            pixels = idx[: width * height]
            if not palette or (pixels and 3 * max(pixels) + 2 >= len(palette)):
                raise ValueError(
                    "GIF palette shorter than pixel indices "
                    f"({len(palette) // 3} entries, max index "
                    f"{max(pixels) if pixels else 0})"
                )
            return [float(palette[3 * i]) for i in pixels]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF payload has no image descriptor")


def gif_bytes(indices: bytes, width: int, height: int) -> bytes:
    """Mint a REAL GIF89a from 8-bit pixel indices (identity grayscale
    palette): header, logical screen descriptor, 256-entry global color
    table, image descriptor, LZW-compressed data in ≤255-byte sub-blocks,
    trailer. The compression is genuine (:func:`_lzw_encode`), so these
    payloads exercise the full decompression path — unlike BMP/WAV,
    whose pixel bytes are stored verbatim."""
    import struct

    if len(indices) != width * height:
        raise ValueError("indices length must be width*height")
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += b"".join(bytes((i, i, i)) for i in range(256))
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
    out.append(8)  # LZW minimum code size
    lzw = _lzw_encode(indices, 8)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> bytes:
    """Reverse the five PNG scanline filters (spec §6: None/Sub/Up/
    Average/Paeth). ``raw`` is the zlib-decompressed stream: per row one
    filter-type byte + width·bpp filtered bytes."""
    stride = width * bpp
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        row = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = row[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = bytes(row)
    return bytes(out)


def decode_png(payload: bytes) -> list[float]:
    """REAL image decoder for PNG (8-bit grayscale, palette, or truecolor;
    non-interlaced) — chunk walking, IDAT reassembly, stdlib-zlib DEFLATE,
    and the full five-filter unfilter pass (:func:`_png_unfilter`) are
    all native; no Pillow. Palette maps through the red channel,
    truecolor through the exact channel mean — the same grayscale
    conventions as :func:`decode_bmp`. Row-major top-down floats."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing PNG signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = None
    palette = b""
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if interlace:
                raise ValueError("interlaced (Adam7) PNG not supported")
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in (0, 2, 3):
                raise ValueError(
                    f"unsupported PNG color type {color_type} "
                    "(gray/truecolor/palette only)"
                )
        elif ctype == b"PLTE":
            palette = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG payload has no IHDR")
    bpp = 3 if color_type == 2 else 1
    raw = zlib.decompress(bytes(idat))
    px = _png_unfilter(raw, width, height, bpp)
    if color_type == 0:
        return [float(b) for b in px]
    if color_type == 3:
        # validate indices against PLTE (may be short or absent in a
        # malformed foreign file) — ValueError, not bare IndexError
        if not palette or (px and 3 * max(px) + 2 >= len(palette)):
            raise ValueError(
                "PNG palette shorter than pixel indices "
                f"({len(palette) // 3} entries, max index "
                f"{max(px) if px else 0})"
            )
        return [float(palette[3 * i]) for i in px]
    return [
        (px[i] + px[i + 1] + px[i + 2]) / 3.0 for i in range(0, len(px), 3)
    ]


def png_bytes(
    gray: bytes, width: int, height: int, filter_type: int = 0
) -> bytes:
    """Mint a REAL 8-bit grayscale PNG: signature, IHDR, one zlib-
    compressed IDAT, IEND — CRCs per chunk. ``filter_type`` applies the
    genuine per-row filter at encode time (0-4), so round-trip tests can
    exercise every unfilter branch with real filtered data."""
    import struct
    import zlib

    if len(gray) != width * height:
        raise ValueError("gray length must be width*height")

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    raw = bytearray()
    prev = bytes(width)
    for r in range(height):
        row = gray[r * width : (r + 1) * width]
        raw.append(filter_type)
        if filter_type == 0:
            raw += row
        elif filter_type == 1:
            raw += bytes(
                (row[i] - (row[i - 1] if i else 0)) & 0xFF
                for i in range(width)
            )
        elif filter_type == 2:
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(width))
        elif filter_type == 3:
            raw += bytes(
                (row[i] - ((row[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                for i in range(width)
            )
        elif filter_type == 4:
            out = bytearray()
            for i in range(width):
                a = row[i - 1] if i else 0
                b, c = prev[i], (prev[i - 1] if i else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                out.append((row[i] - pred) & 0xFF)
            raw += out
        else:
            raise ValueError(f"unknown PNG filter type {filter_type}")
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def default_decoder(payload: bytes) -> list[float]:
    """Magic-byte dispatch over the REAL container decoders: BMP, WAV,
    GIF (from-scratch LZW), and PNG (stdlib-zlib DEFLATE + native
    five-filter unfiltering) parse natively; any other container still
    raises the declared NotImplementedError seam (JPEG/MP4 need
    libraries this sandbox does not ship — inject Pillow/ffmpeg in
    deployment)."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    raise NotImplementedError(
        "no native decoder for this container (BMP/WAV/GIF/PNG parse "
        "in-sandbox; inject Pillow/ffmpeg for JPEG/MP4)"
    )


def byte_decode(payload: bytes) -> list[float]:
    """Structural decode stand-in: payload bytes ARE the pixel grid (one
    grayscale byte per feature). Unlike :func:`fake_decode` (md5 chain —
    any byte change rerolls every feature), this preserves LOCALITY:
    payloads differing in one byte decode to features differing in one
    position, so perceptual-hash near-dup behavior is actually exercised
    — and an engine without a decoder can reproduce every feature from
    the bytes (the multimodal_phash_dedup oracle does, via ord())."""
    return [float(b) for b in payload]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """Arrow-batched feature extraction over media payloads.

    ``decoder=None`` raises NotImplementedError at task time for real media
    (the stub contract); pass :func:`fake_decode` (tests/gate) or a real
    decoder. Output: id, mime, n_bytes, md5 fingerprint, float feature
    vector."""

    def run(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = pdf["payload"]
            if decoder is None:
                raise NotImplementedError(
                    "no media decoder available in this environment; "
                    "inject one (e.g. Pillow/ffmpeg) or use fake_decode"
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [len(p) for p in payloads],
                    "fingerprint": [hashlib.md5(p).hexdigest() for p in payloads],
                    "feature": [decoder(p) for p in payloads],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Arrow-batched media resize stage. ``resizer=None`` raises at task
    time (stub contract — Pillow/ffmpeg are not in this container); the
    plumbing (batching, schema, metadata update) is real. Output keeps the
    canonical (id, payload, meta) layout with width/height filled."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if resizer is None:
                raise NotImplementedError(
                    "no media resizer available in this environment; inject "
                    "one (e.g. Pillow) — plumbing is exercised with a fake in tests"
                )
            payloads = [resizer(p, width, height) for p in pdf["payload"]]
            metas = [
                {
                    "mime": m["mime"],
                    "n_bytes": len(p),
                    "width": width,
                    "height": height,
                    "duration_ms": m["duration_ms"],
                }
                for m, p in zip(pdf["meta"], payloads)
            ]
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads, "meta": metas})

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", MEDIA_META_SCHEMA),
        ]
    )
    return media.mapInPandas(run, schema=out_schema)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic resize stand-in: truncate/pad to width*height bytes."""
    target = max(1, width * height)
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def sample_frames_expr(duration_ms: Column, every_ms: int) -> Column:
    """Frame-sampling plan: timestamps (ms) to decode for a video payload —
    the cheap plan-side half of frame extraction; the decode itself is the
    stubbed heavy half."""
    return F.sequence(F.lit(0), duration_ms, F.lit(every_ms))


def fake_frame_extract(payload: bytes, ts_ms: int) -> bytes:
    """Deterministic frame-grab stand-in: a byte window selected by the
    timestamp. Replace with ffmpeg seek+decode outside this container."""
    if not payload:
        return b""
    start = (ts_ms * 7) % max(len(payload), 1)
    return (payload + payload)[start : start + 16]


def explode_frames(
    media: DataFrame,
    every_ms: int,
    extractor: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video → per-frame rows: frame timestamps come from the plan-side
    :func:`sample_frames_expr` over the duration metadata (cheap, codegen),
    then each (video, ts) row gets its frame payload from an Arrow-batched
    extractor — the expensive half, stubbed behind the same injection
    contract as decode/resize. A video with NULL duration contributes no
    frames (undecoded media must run a probe stage first).

    Shuffle story at 100 TB: the explode multiplies ROWS map-side but the
    heavy payload column is carried once per video into the task that
    explodes it; repartition videos (not frames) upstream and size Arrow
    batches by bytes. Output: (id, frame_ts_ms, frame payload).
    """
    with_ts = media.filter(F.col("meta.duration_ms").isNotNull()).select(
        "id",
        "payload",
        F.explode(
            sample_frames_expr(F.col("meta.duration_ms"), every_ms)
        ).alias("frame_ts_ms"),
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if extractor is None:
                raise NotImplementedError(
                    "no frame extractor available in this environment; "
                    "inject one (e.g. ffmpeg) or use fake_frame_extract"
                )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "frame": [
                        extractor(p, int(t))
                        for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
                    ],
                }
            )

    return with_ts.mapInPandas(
        run, schema="id long, frame_ts_ms long, frame binary"
    )


def chunk_audio(
    media: DataFrame,
    bytes_per_chunk: int,
) -> DataFrame:
    """Audio → fixed-size chunk rows, pure plan-side (no Python): chunk
    boundaries are byte offsets into the payload, the substrate for
    windowed transcription/feature stages. Output: (id, chunk_idx,
    chunk binary, n_bytes). The final short chunk is kept."""
    n_chunks = F.ceil(
        F.length(F.col("payload")) / F.lit(bytes_per_chunk)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0))),
        lambda i: F.substring(
            F.col("payload").cast("binary"), i * bytes_per_chunk + 1, bytes_per_chunk
        ),
    )
    return (
        media.filter(F.length("payload") > 0)
        .select("id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        .select(
            "id",
            "chunk_idx",
            "chunk",
            F.length("chunk").cast("long").alias("n_bytes"),
        )
    )


def media_phash(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    dim: int = 48,
) -> DataFrame:
    """Perceptual average-hash over decoded media features: bit ``i`` of
    the hash is set when feature ``i`` exceeds the per-item feature mean —
    with a real decoder emitting downscaled grayscale pixels this IS
    classic aHash; with :func:`fake_decode` it is the deterministic stand-
    in the container contract prescribes. ``dim ≤ 62`` keeps the packed
    hash inside a signed BIGINT.

    The decoder must emit exactly ``dim`` features per item (bind the
    dimension, e.g. ``partial(fake_decode, dim=48)`` — a short vector
    would silently zero the high bits through the zip). The decode runs
    through the Arrow-batched :func:`extract_features` scan; the thresholding and bit packing are pure codegen HOF folds
    over the feature array (zero additional shuffles), so the whole op is
    map-only. Near-dup media then rides the SAME machinery as text
    simhash: see :func:`phash_pairs`."""
    if dim > 62:
        raise ValueError("dim must be <= 62 to fit a signed BIGINT")
    feats = extract_features(
        media, decoder=decoder, feature_dim=dim
    ).select("id", "feature")
    mean = F.aggregate(
        F.col("feature"), F.lit(0.0), lambda a, x: a + x
    ) / F.size("feature")
    packed = F.aggregate(
        F.zip_with(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            F.col("feature"),
            # 2^i via pow: F.shiftleft needs a literal shift amount, and
            # doubles are exact powers of two up to 2^52 (dim ≤ 62 < 53
            # would overflow — hence the dim guard above uses 48 default)
            lambda i, v: F.when(
                v > F.col("_mean"), F.pow(F.lit(2.0), i).cast("bigint")
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return (
        feats.withColumn("_mean", mean)
        .select("id", packed.alias("phash"))
    )


def media_dhash(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    dim: int = 49,
) -> DataFrame:
    """Difference hash over decoded media features: bit ``i`` is set when
    feature ``i+1`` exceeds feature ``i`` — the classic dHash gradient
    sign (public: Krawetz, "Kind of Like That"). Compared with the mean
    threshold of :func:`media_phash`, the per-neighbor comparison has no
    global statistic, so a single changed pixel flips AT MOST its two
    adjacent bits (aHash's mean shift can flip any near-mean bit) and
    uniform brightness changes cancel entirely.

    ``dim`` features produce a ``dim−1``-bit hash (default 49 → 48 bits,
    matching :func:`phash_pairs`' default banding). Same map-only plan
    as media_phash: Arrow decode, then a codegen HOF fold — element_at
    inside the lambda is O(1) per element, so the pack is O(dim)/row.
    Output column is named ``phash`` so both hash families feed
    :func:`phash_pairs` unchanged."""
    if dim - 1 > 62:
        raise ValueError("dim-1 must be <= 62 to fit a signed BIGINT")
    feats = extract_features(
        media, decoder=decoder, feature_dim=dim
    ).select("id", "feature")
    packed = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 2)),
            lambda i: F.when(
                F.element_at(F.col("feature"), (i + F.lit(2)).cast("int"))
                > F.element_at(F.col("feature"), (i + F.lit(1)).cast("int")),
                F.pow(F.lit(2.0), i).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    return feats.select("id", packed.alias("phash"))


def phash_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    dim: int = 48,
    n_bands: int = 4,
    id_col: str = "id",
    hash_col: str = "phash",
    max_bucket_size: int | None = 50,
    checkpoint_hashes: bool = True,
) -> DataFrame:
    """Near-duplicate media pairs by hamming distance over the perceptual
    hashes: split each hash into ``n_bands`` bit-bands and join on band
    equality (pigeonhole: hamming ≤ n_bands−1 GUARANTEES a shared band;
    higher ``max_hamming`` keeps recall high but not certain — the same
    trade as text simhash banding, dedup.py), then verify the exact
    ``bit_count(xor)`` distance. The band id is the only shuffle key.
    Returns (id1, id2, hamming), id1 < id2. ``max_bucket_size`` bounds
    degenerate buckets exactly like dedup.lsh_candidate_pairs (drop
    buckets above the cap — see the inline comment); ``None`` disables.

    ``dim`` must divide evenly into ``n_bands``: with ``width = dim //
    n_bands`` the top ``dim % n_bands`` bits would fall outside every
    band, so differences there could never weaken band agreement and
    the pigeonhole recall guarantee would silently degrade (ADVICE r5 —
    mirrors the explicit dim guard in media_phash)."""
    if dim % n_bands != 0:
        raise ValueError(
            f"dim={dim} is not divisible by n_bands={n_bands}; the top "
            f"{dim % n_bands} bits would be banded nowhere, silently "
            "degrading the pigeonhole recall guarantee"
        )
    width = dim // n_bands
    mask = (1 << width) - 1
    if checkpoint_hashes:
        # The hash relation is consumed by up to three exchanges (bucket
        # guard, both self-join sides). The text-LSH path relies on
        # AQE's ReuseExchange for the same shape, but here the lineage
        # upstream is the media DECODE — the expensive stage with a real
        # codec — so a (id, long)-sized localCheckpoint guarantees
        # decode-once regardless of what the planner reuses. Pass False
        # when the hashes are already materialized (stored index).
        hashes = hashes.localCheckpoint()
    bands = hashes.select(
        F.col(id_col).alias("_id"),
        F.col(hash_col).alias("_h"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    (
                        F.shiftrightunsigned(F.col(hash_col), b * width)
                        .bitwiseAND(F.lit(mask))
                    ).alias("bits"),
                )
                for b in range(n_bands)
            ])
        ).alias("bb"),
    ).select("_id", "_h", F.col("bb.band").alias("band"), F.col("bb.bits").alias("bits"))
    if max_bucket_size is not None:
        # Hot-bucket guard, same contract as dedup.lsh_candidate_pairs:
        # a corpus of identical media (one phash) puts every item in one
        # bucket per band → that bucket alone is O(n²). Buckets larger
        # than the cap are dropped ENTIRELY — deterministic, mirrored by
        # the gate oracle (HAVING COUNT(*) <= cap), and safe in a tiered
        # pipeline because byte-identical media is what the cheaper
        # exact-fingerprint tier already collapsed.
        small = (
            bands.groupBy("band", "bits")
            .agg(F.count(F.lit(1)).alias("_bn"))
            .filter(F.col("_bn") <= max_bucket_size)
            .select("band", "bits")
        )
        bands = bands.join(small, on=["band", "bits"], how="left_semi")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bits") == F.col("b.bits"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id1"),
            F.col("b._id").alias("id2"),
            F.col("a._h").alias("h1"),
            F.col("b._h").alias("h2"),
        )
        .distinct()
    )
    ham = F.expr("bit_count(h1 ^ h2)")
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id1", "id2", "hamming")
    )


def media_dct_phash(
    media: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    side: int = 8,
    keep: int = 8,
) -> DataFrame:
    """Classic DCT perceptual hash (pHash proper): decode a ``side×side``
    pixel grid, 2-D orthonormal DCT-II, keep the ``keep×keep``
    low-frequency block, drop the DC term, set bit ``i`` when coefficient
    ``i`` exceeds the block MEDIAN → a ``keep²−1``-bit hash. Median-of-AC
    thresholding makes the hash invariant to brightness offsets (only DC
    moves) AND to positive contrast scaling (all coefficients and their
    median scale together) — the two robustness properties neither aHash
    nor dHash fully has, pinned by tests.

    The DCT runs as an Arrow-batched numpy scan (one (B, side²) @
    (side², side²) matmul per batch — the BLAS-scan idiom of
    similarity.py), so it is NOT SQL-expressible: this operator is
    python-replay verified rather than oracle-gated; the downstream
    banded pair join is the same oracle-gated machinery as aHash/dHash
    (:func:`phash_pairs` — pick ``n_bands`` dividing ``keep²−1``, e.g.
    63 bits → 3 bands of 21)."""
    import numpy as np

    n_px = side * side
    bits = keep * keep - 1
    if bits > 63:
        # shifts 0..62 with every bit set sum to 2^63−1 — the exact
        # signed-BIGINT max, and the numpy path shifts int64s (no
        # double-exactness concern like media_phash's pow() pack)
        raise ValueError("keep^2-1 must be <= 63 to fit a signed BIGINT")
    feats = extract_features(media, decoder=decoder, feature_dim=n_px).select(
        "id", "feature"
    )
    # orthonormal DCT-II basis, built once on the driver and captured by
    # value in the closure (no package references worker-side)
    j = np.arange(side)
    basis = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / (2 * side))
    basis *= np.sqrt(2.0 / side)
    basis[0, :] = np.sqrt(1.0 / side)

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            block = np.array(pdf["feature"].tolist(), dtype=np.float64)
            imgs = block.reshape(-1, side, side)
            coef = np.einsum("ij,bjk,lk->bil", basis, imgs, basis)
            low = coef[:, :keep, :keep].reshape(len(imgs), -1)[:, 1:]  # drop DC
            med = np.median(low, axis=1, keepdims=True)
            packed = ((low > med).astype(np.int64) << np.arange(bits)).sum(
                axis=1
            )
            yield pd.DataFrame({"id": pdf["id"], "phash": packed})

    return feats.mapInPandas(scan, schema="id long, phash long")


def video_phash_signature(
    media: DataFrame,
    every_ms: int = 1000,
    extractor: Callable[[bytes, int], bytes] | None = None,
    frames: int = 4,
) -> DataFrame:
    """Video near-dup signature: sample frames on the ``every_ms`` grid
    (:func:`explode_frames`), difference-hash each frame's bytes (the
    :func:`media_dhash` gradient-sign rule over the 16-byte frame → 15
    bits), and pack the first ``frames`` frame-hashes time-ordered into
    ONE BIGINT — so :func:`phash_pairs` with ``width = 15`` bands makes
    "some sampled frame hashes identical at the same timestamp" the
    candidate rule, and the hamming verify counts drifted gradient bits
    across the whole clip. The standard shape (frame signature + banded
    index) of published video copy-detection systems, on this package's
    deterministic stand-in extractor.

    Requires ``frames·15 ≤ 62``: default 4 frames → 60 bits. Videos
    with fewer than ``frames`` sampled frames are dropped (short-clip
    policy stated here rather than padded silently). One Arrow scan for
    the frame hash, one keyed aggregate for the pack — no other
    shuffles."""
    if frames * 15 > 62:
        raise ValueError("frames*15 must be <= 62 to fit a signed BIGINT")
    fr = explode_frames(media, every_ms, extractor)

    def hash_frames(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for fb in pdf["frame"]:
                b = np.frombuffer(bytes(fb), dtype=np.uint8).astype(np.int64)
                gt = (b[1:] > b[:-1]).astype(np.int64)
                out.append(int((gt << np.arange(len(gt))).sum()))
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "frame_ts_ms": pdf["frame_ts_ms"],
                    "fhash": out,
                }
            )

    hashed = fr.mapInPandas(
        hash_frames, schema="id long, frame_ts_ms long, fhash long"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id").orderBy("frame_ts_ms")
    packed = (
        hashed.withColumn("_idx", F.row_number().over(w) - 1)
        .filter(F.col("_idx") < frames)
        .groupBy("id")
        .agg(
            F.sum(
                F.col("fhash")
                * F.pow(F.lit(2.0), F.col("_idx") * 15).cast("bigint")
            )
            .cast("bigint")
            .alias("phash"),
            F.count(F.lit(1)).alias("_nf"),
        )
        .filter(F.col("_nf") >= frames)
        .select("id", "phash")
    )
    return packed


def audio_fingerprint(
    media: DataFrame,
    chunk_bytes: int = 18,
    bands: int = 6,
    chunks: int = 12,
    decoder: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """Audio near-dup fingerprint in the Haitsma-Kalker shape (Philips
    robust hash, ISMIR 2002): per time chunk, per frequency band, the
    bit is the SIGN of the energy difference along both axes —
    ``(E[k][m] − E[k][m+1]) − (E[k−1][m] − E[k−1][m+1]) > 0`` — so the
    fingerprint tracks the energy LANDSCAPE, not absolute levels (gain
    changes cancel in both differences). On this container's stand-in
    decode the payload bytes are the per-band energy proxy (band energy
    = byte-range sum); a real deployment swaps the band-energy stage for
    an FFT filter bank and keeps everything downstream.

    ``chunks`` chunks × (bands−1) bits pack into one BIGINT
    (time-ordered, like :func:`video_phash_signature`), feeding
    :func:`phash_pairs` with ``width = bands−1`` multiples. Audio
    shorter than ``(chunks+1)·chunk_bytes`` is the caller's policy —
    pad or drop BEFORE this operator; it requires full frames and drops
    incomplete tails. Map-only Arrow scan; the pack is the only keyed
    aggregate.

    ``decoder``: optional container decode (e.g. :func:`decode_wav`) run
    per payload BEFORE framing — the sample stream replaces raw payload
    bytes as the per-band energy proxy; ``None`` keeps the byte-PCM
    stand-in (payload bytes ARE the samples). Decoded samples are
    truncated toward int64 so 8-bit PCM round-trips bit-exactly."""
    bits_per_chunk = bands - 1
    total_bits = chunks * bits_per_chunk
    if total_bits > 62:
        raise ValueError("chunks*(bands-1) must be <= 62 to fit a BIGINT")
    if chunk_bytes % bands != 0:
        raise ValueError(f"chunk_bytes={chunk_bytes} must divide into {bands} bands")
    need = (chunks + 1) * chunk_bytes

    def scan(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, sigs = [], []
            for vid, payload in zip(pdf["id"], pdf["payload"]):
                b = bytes(payload)
                if decoder is not None:
                    samples = np.asarray(decoder(b), dtype=np.float64)
                    if len(samples) < need:
                        continue  # incomplete frames: dropped by contract
                    arr = samples[:need].astype(np.int64).reshape(
                        chunks + 1, bands, chunk_bytes // bands
                    )
                elif len(b) < need:
                    continue  # incomplete frames: dropped by contract
                else:
                    arr = (
                        np.frombuffer(b[:need], dtype=np.uint8)
                        .astype(np.int64)
                        .reshape(chunks + 1, bands, chunk_bytes // bands)
                    )
                energy = arr.sum(axis=2)  # (chunks+1, bands)
                horiz = energy[:, :-1] - energy[:, 1:]  # (chunks+1, bands-1)
                double_diff = horiz[1:] - horiz[:-1]  # (chunks, bands-1)
                bits = (double_diff > 0).astype(np.int64).reshape(-1)
                sigs.append(int((bits << np.arange(total_bits)).sum()))
                ids.append(vid)
            yield pd.DataFrame({"id": ids, "phash": sigs})

    return media.select("id", "payload").mapInPandas(
        scan, schema="id long, phash long"
    )


def byte_decode_sized(dim: int) -> Callable[[bytes], list[float]]:
    """:func:`byte_decode` normalized to exactly ``dim`` features
    (truncate / zero-pad) — the arbitrary-length-payload adapter the
    fixed-grid hash families need. Real decoders normalize by RESIZING
    (the resize_media stage); this stand-in keeps the byte semantics."""

    def decode(payload: bytes) -> list[float]:
        b = payload[:dim]
        return [float(x) for x in b] + [0.0] * (dim - len(b))

    return decode


#: hash family registry for media_dedup: name → (hasher kwargs-free
#: callable, feature dim, hash bits, default bands)
_HASH_FAMILIES = {
    "ahash": (48, 48, 4),
    "dhash": (49, 48, 4),
    "dct": (64, 63, 3),
}


def media_dedup(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    mime: str = "application/octet-stream",
    hash_family: str = "dhash",
    decoder: Callable[[bytes], list[float]] | None = None,
    max_hamming: int = 6,
    max_bucket_size: int | None = 50,
) -> DataFrame:
    """End-to-end media dedup: decode → perceptual hash (``ahash`` /
    ``dhash`` / ``dct``) → banded hamming candidates → connected
    components → canonical-per-cluster. The media twin of the text
    pipeline's near-dup stage, riding the same cluster/survivor backend.

    ``decoder=None`` uses the sized byte-decode stand-in (truncate/pad
    to the family's grid); inject a real decoder in deployment. Returns
    one row per input item: ``(id, cluster_id, canonical_id,
    cluster_size, kept)`` — ``kept`` is the lowest-id survivor rule
    (:func:`corpus.select_canonicals`)."""
    from .corpus import connected_components, select_canonicals

    if hash_family not in _HASH_FAMILIES:
        raise ValueError(
            f"unknown hash_family {hash_family!r}; pick from "
            f"{sorted(_HASH_FAMILIES)}"
        )
    dim, bits, bands = _HASH_FAMILIES[hash_family]
    decoder = decoder or byte_decode_sized(dim)
    media = media_table(df, id_col, payload_col, mime)
    if hash_family == "ahash":
        hashes = media_phash(media, decoder=decoder, dim=dim)
    elif hash_family == "dhash":
        hashes = media_dhash(media, decoder=decoder, dim=dim)
    else:
        hashes = media_dct_phash(media, decoder=decoder)
    pairs = phash_pairs(
        hashes,
        max_hamming=max_hamming,
        dim=bits,
        n_bands=bands,
        max_bucket_size=max_bucket_size,
    )
    nodes = hashes.select(F.col("id").alias("node"))
    labels = connected_components(
        nodes, pairs, id_col="node", src_col="id1", dst_col="id2"
    )
    canon = select_canonicals(labels, nodes.selectExpr("node as doc_id"))
    # plain join, NOT a broadcast hint: the canonical relation is
    # cluster-count-sized (≈ item-count in the no-dup worst case) — AQE
    # broadcasts it when it is actually small
    return (
        labels.select(F.col("node").alias("id"), "cluster_id")
        .join(canon, on="cluster_id", how="left")
        .select(
            "id",
            "cluster_id",
            "canonical_id",
            "cluster_size",
            (F.col("id") == F.col("canonical_id")).alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# ISO-BMFF (MP4) container probing — r12. Frame DECODE stays the
# declared codec seam (H.264/HEVC need real codec libraries), but the
# CONTAINER is a plain box tree (public spec ISO/IEC 14496-12) and
# parses natively: the metadata a 100 TB video-curation pipeline needs
# for planning (duration for frame-sampling budgets, dimensions for
# resize targets, track inventory for audio/video routing) comes from
# moov/mvhd/tkhd/hdlr, not from decoding a single frame.
# ---------------------------------------------------------------------------

def _walk_boxes(payload: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the boxes in
    [start, end): u32-BE size includes the 8-byte header; size 1 = u64
    largesize follows; size 0 = box extends to the end."""
    import struct

    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", payload, pos)
        btype = payload[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            (size,) = struct.unpack_from(">Q", payload, pos + 8)
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"corrupt MP4 box {btype!r} at {pos}")
        yield btype, body, pos + size
        pos += size


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia"}


def probe_mp4(payload: bytes) -> dict:
    """Native MP4/ISO-BMFF structure probe: walks the box tree and
    returns ``{"brand", "duration_ms", "width", "height",
    "n_video_tracks", "n_audio_tracks"}``. mvhd version 0/1 supported;
    tkhd width/height are 16.16 fixed point; handler types from hdlr
    classify tracks. Raises on non-BMFF payloads (no ftyp) and corrupt
    box sizes — never guesses."""
    import struct

    boxes = list(_walk_boxes(payload, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not an MP4 payload (missing leading ftyp box)")
    out = {
        "brand": payload[boxes[0][1] : boxes[0][1] + 4].decode("ascii"),
        "duration_ms": None,
        "width": None,
        "height": None,
        "n_video_tracks": 0,
        "n_audio_tracks": 0,
    }

    def visit(start: int, end: int) -> None:
        for btype, b0, b1 in _walk_boxes(payload, start, end):
            if btype in _MP4_CONTAINERS:
                visit(b0, b1)
            elif btype == b"mvhd":
                version = payload[b0]
                if version == 1:
                    timescale, duration = struct.unpack_from(
                        ">IQ", payload, b0 + 4 + 16
                    )
                else:
                    _c, _m, timescale, duration = struct.unpack_from(
                        ">IIII", payload, b0 + 4
                    )
                if timescale:
                    out["duration_ms"] = duration * 1000 // timescale
            elif btype == b"tkhd":
                version = payload[b0]
                w_off = b1 - 8
                (w_fx, h_fx) = struct.unpack_from(">II", payload, w_off)
                if w_fx and out["width"] is None:
                    out["width"] = w_fx >> 16
                    out["height"] = h_fx >> 16
            elif btype == b"hdlr":
                handler = payload[b0 + 8 : b0 + 12]
                if handler == b"vide":
                    out["n_video_tracks"] += 1
                elif handler == b"soun":
                    out["n_audio_tracks"] += 1

    for btype, b0, b1 in boxes:
        if btype == b"moov":
            visit(b0, b1)
    return out


def mp4_skeleton(
    duration_ms: int,
    width: int,
    height: int,
    n_audio_tracks: int = 0,
    timescale: int = 1000,
) -> bytes:
    """Mint a structurally-valid MP4 skeleton (ftyp + moov with mvhd and
    one video trak per the given dimensions, plus optional audio traks,
    and an empty mdat): the box layout :func:`probe_mp4` parses, built
    from the same public spec. No encoded samples — the honest fixture
    for container-level gates (frame decode remains the codec seam)."""
    import struct

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    duration = duration_ms * timescale // 1000
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + bytes(24)
        + struct.pack(">I", 2),
    )

    def trak(handler: bytes, w: int, h: int, track_id: int) -> bytes:
        tkhd = box(
            b"tkhd",
            bytes(1) + b"\x00\x00\x07"  # version 0, enabled flags
            + struct.pack(">IIII", 0, 0, track_id, 0)
            + struct.pack(">I", duration)
            + bytes(8)
            + struct.pack(">HHHH", 0, 0, 0x0100 if handler == b"soun" else 0, 0)
            + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = box(
            b"hdlr",
            bytes(4) + bytes(4) + handler + bytes(12) + b"probe\0",
        )
        return box(b"trak", tkhd + box(b"mdia", hdlr))

    traks = trak(b"vide", width, height, 1)
    for i in range(n_audio_tracks):
        traks += trak(b"soun", 0, 0, 2 + i)
    return (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
        + box(b"moov", mvhd + traks)
        + box(b"mdat", b"")
    )
