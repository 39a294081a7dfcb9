"""WebDataset-style tar shard IO for multimodal training samples.

The de-facto packaging for large-scale image/audio training corpora
(public: the WebDataset convention — samples as consecutive tar members
sharing a key, ``<key>.<ext>`` payload + ``<key>.json`` metadata,
sharded into fixed-count tar files streamed sequentially by data
loaders). This module writes and reads that layout with stdlib
``tarfile`` — no external dependency, so the multimodal tier's
packaging runs end-to-end in-sandbox on the same canonical
``(id, payload, meta)`` relation as the decode/hash operators
(operators/multimodal.py).

Scale shape: the writer repartitions BY SHARD KEY (pmod of the id) so
each task streams exactly one tar — write volume is one sequential
file per shard, no shuffle beyond the one keyed repartition, and shard
count is the parallelism knob for the downstream loader fleet. The
reader parallelizes over shard FILES (one task per shard, the unit
WebDataset itself streams), so a 100 TB corpus reads at
min(#shards, cores) with zero small-file pressure. Members within a
shard are id-ordered (deterministic bytes for a given input multiset +
shard count — re-exports are diffable).

Reference parity: the reference engine has no multimodal packaging; this
is mandate surface ("multimodal columns … at 100 TB") — the export twin
of the JSONL.gz text-shard writer (sources/text_corpus.py).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# task closures reference module constants (_EXT, _TAR_EPOCH): ship the
# module by value so arbitrary-cwd drivers run it (the kll.py lesson)
def _register_by_value() -> None:
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])


_register_by_value()


#: mime → member extension for the payload entry
_EXT = {
    "image/bmp": "bmp",
    "image/png": "png",
    "image/jpeg": "jpg",
    "image/x-gray8": "raw",
    "audio/wav": "wav",
    "audio/x-pcm8": "pcm",
    "video/mp4": "mp4",
    "application/octet-stream": "bin",
}

#: fixed timestamp for tar members: tar headers embed mtime, and a
#: training-data export must be byte-reproducible (house determinism
#: rule — same reason the KLL sketch derives its coin from content)
_TAR_EPOCH = 0


def write_tar_shards(
    media: DataFrame,
    out_dir: str,
    n_shards: int = 8,
    id_col: str = "id",
    payload_col: str = "payload",
    meta_col: str = "meta",
) -> None:
    """Export ``(id, payload, meta)`` rows as ``shard-{i:05d}.tar`` files
    under ``out_dir`` in the WebDataset member convention: per sample a
    ``{id}.{ext}`` payload member (ext from ``meta.mime``) followed by a
    ``{id}.json`` metadata member. One keyed repartition; each task
    writes its shard sequentially with id-ordered members."""
    os.makedirs(out_dir, exist_ok=True)
    src = media.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.to_json(F.col(meta_col)).alias("meta_json"),
        F.pmod(F.col(id_col).cast("long"), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
    )

    def write_shard(batches: Iterator) -> Iterator:
        import pandas as pd

        rows = []
        for pdf in batches:
            rows.append(pdf)
        if not rows:
            yield pd.DataFrame({"shard": [], "n_samples": []})
            return
        all_rows = pd.concat(rows).sort_values("id")
        out = []
        for shard, grp in all_rows.groupby("shard"):
            path = os.path.join(out_dir, f"shard-{int(shard):05d}.tar")
            tmp = path + ".stage"
            with tarfile.open(tmp, "w") as tf:
                # itertuples, not iterrows: iterrows builds a Series per
                # row; with large binary payloads the per-row overhead is
                # pure waste next to the tar byte copy
                for r in grp.itertuples(index=False):
                    key = str(int(r.id))
                    # to_json(null struct) is None — normalize to "{}" so
                    # null-meta rows still write a .json member and
                    # round-trip instead of AttributeError on .encode()
                    meta_json = r.meta_json or "{}"
                    meta = json.loads(meta_json)
                    ext = _EXT.get(meta.get("mime"), "bin")
                    payload = bytes(r.payload)
                    for name, body in (
                        (f"{key}.{ext}", payload),
                        (f"{key}.json", meta_json.encode()),
                    ):
                        info = tarfile.TarInfo(name=name)
                        info.size = len(body)
                        info.mtime = _TAR_EPOCH
                        tf.addfile(info, io.BytesIO(body))
            os.replace(tmp, path)  # atomic publish per shard
            out.append({"shard": int(shard), "n_samples": len(grp)})
        yield pd.DataFrame(out, columns=["shard", "n_samples"])

    manifest = (
        src.repartition(n_shards, "shard")
        .mapInPandas(write_shard, "shard int, n_samples long")
        .filter(F.col("n_samples") > 0)
    )
    # manifest parquet: shard → sample count (the loader's size index)
    manifest.write.mode("overwrite").parquet(
        os.path.join(out_dir, "_manifest")
    )


def read_tar_shards(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Read a WebDataset shard directory back as ``(id, payload, meta)``
    — one task per shard file (the format's natural parallel unit),
    members re-paired by key, metadata parsed from the ``.json`` twin.
    The shard list is driver-side directory metadata (bounded), the
    bytes never touch the driver."""
    shards = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".tar")
    )
    if not shards:
        raise FileNotFoundError(f"no .tar shards under {shard_dir}")
    paths = spark.createDataFrame(
        [(p,) for p in shards], "path string"
    ).repartition(len(shards), "path")

    def read_shard(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for path in pdf["path"]:
                samples: dict[str, dict] = {}
                with tarfile.open(path, "r") as tf:
                    for member in tf.getmembers():
                        key, _, ext = member.name.rpartition(".")
                        body = tf.extractfile(member).read()
                        slot = samples.setdefault(key, {})
                        if ext == "json":
                            slot["meta_json"] = body.decode()
                        else:
                            slot["payload"] = body
                if samples:
                    yield pd.DataFrame(
                        [
                            {
                                "id": int(k),
                                "payload": v.get("payload"),
                                "meta_json": v.get("meta_json"),
                            }
                            for k, v in sorted(
                                samples.items(), key=lambda kv: int(kv[0])
                            )
                        ]
                    )

    raw = paths.mapInPandas(
        read_shard, "id long, payload binary, meta_json string"
    )
    from ..operators.multimodal import MEDIA_META_SCHEMA

    return raw.select(
        "id",
        "payload",
        F.from_json("meta_json", MEDIA_META_SCHEMA).alias("meta"),
    )


def shard_manifest(spark: SparkSession, shard_dir: str) -> DataFrame:
    """The writer's (shard, n_samples) manifest."""
    return spark.read.parquet(os.path.join(shard_dir, "_manifest"))
