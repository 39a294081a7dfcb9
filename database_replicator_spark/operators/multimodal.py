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
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
    Replace with a real decoder (Pillow/ffmpeg) outside this container."""
    import hashlib

    out: list[float] = []
    h = payload
    for i in range(dim):
        h = hashlib.md5(h + bytes([i])).digest()
        out.append(int.from_bytes(h[:4], "big") / float(2**32))
    return out


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
