"""Multimodal plumbing tests: schema, batching, stub contract."""

import pytest
from pyspark.sql import functions as F

from database_replicator_spark.operators.multimodal import (
    extract_features,
    fake_decode,
    media_table,
    sample_frames_expr,
)


@pytest.fixture()
def media(spark):
    df = spark.createDataFrame(
        [(1, b"payload-one"), (2, b"payload-two-longer")], "doc_id long, payload binary"
    )
    return media_table(df, "doc_id", "payload", "image/png")


class TestMediaTable:
    def test_schema_and_meta(self, media):
        assert [f.name for f in media.schema.fields] == ["id", "payload", "meta"]
        row = media.orderBy("id").collect()[0]
        assert row["meta"]["mime"] == "image/png"
        assert row["meta"]["n_bytes"] == len(b"payload-one")
        assert row["meta"]["width"] is None


class TestExtractFeatures:
    def test_stub_raises_without_decoder(self, media):
        with pytest.raises(Exception, match="no media decoder available"):
            extract_features(media, decoder=None).collect()

    def test_fake_decode_deterministic(self, media):
        a = extract_features(media, decoder=fake_decode).orderBy("id").collect()
        b = extract_features(media.repartition(3), decoder=fake_decode).orderBy("id").collect()
        assert [r["feature"] for r in a] == [r["feature"] for r in b]
        assert all(len(r["feature"]) == 8 for r in a)
        assert a[0]["fingerprint"] != a[1]["fingerprint"]
        assert a[0]["n_bytes"] == len(b"payload-one")

    def test_fake_decode_values_stable(self):
        v1 = fake_decode(b"x")
        v2 = fake_decode(b"x")
        v3 = fake_decode(b"y")
        assert v1 == v2 and v1 != v3
        assert all(0.0 <= x < 1.0 for x in v1)


def test_sample_frames_plan(spark):
    df = spark.createDataFrame([(10_000,)], "duration_ms long")
    out = df.select(sample_frames_expr(F.col("duration_ms"), 4_000).alias("ts")).collect()
    assert out[0]["ts"] == [0, 4000, 8000]


class TestResize:
    def test_stub_raises_without_resizer(self, media):
        from database_replicator_spark.operators.multimodal import resize_media

        with pytest.raises(Exception, match="no media resizer available"):
            resize_media(media, 4, 4).collect()

    def test_fake_resize_plumbing(self, media):
        from database_replicator_spark.operators.multimodal import fake_resize, resize_media

        out = resize_media(media, 4, 4, resizer=fake_resize).orderBy("id").collect()
        assert all(len(r["payload"]) == 16 for r in out)
        assert all(r["meta"]["width"] == 4 and r["meta"]["height"] == 4 for r in out)
        assert all(r["meta"]["n_bytes"] == 16 for r in out)
        assert out[0]["meta"]["mime"] == "image/png"  # original mime preserved


class TestExplodeFrames:
    def _video(self, spark):
        from database_replicator_spark.operators.multimodal import media_table
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, b"videopayloadbytes" * 4), (2, b"short")],
            "doc_id long, payload binary",
        )
        m = media_table(df, "doc_id", "payload", "video/mp4")
        # probe stage stand-in: fill duration for doc 1 only
        return m.withColumn(
            "meta",
            F.struct(
                F.col("meta.mime"),
                F.col("meta.n_bytes"),
                F.col("meta.width"),
                F.col("meta.height"),
                F.when(F.col("id") == 1, F.lit(9000)).cast("long").alias("duration_ms"),
            ),
        )

    def test_stub_raises_without_extractor(self, spark):
        import pytest
        from database_replicator_spark.operators.multimodal import explode_frames

        with pytest.raises(Exception, match="NotImplementedError|no frame extractor"):
            explode_frames(self._video(spark), every_ms=4000).collect()

    def test_frames_per_sampled_timestamp(self, spark):
        from database_replicator_spark.operators.multimodal import (
            explode_frames,
            fake_frame_extract,
        )

        out = explode_frames(
            self._video(spark), every_ms=4000, extractor=fake_frame_extract
        ).collect()
        rows = {(r["id"], r["frame_ts_ms"]): r["frame"] for r in out}
        # duration 9000 @ every 4000 -> ts 0, 4000, 8000; doc 2 has no duration
        assert set(rows) == {(1, 0), (1, 4000), (1, 8000)}
        assert all(isinstance(v, (bytes, bytearray)) and len(v) > 0 for v in rows.values())


class TestChunkAudio:
    def test_fixed_chunks_with_short_tail(self, spark):
        from database_replicator_spark.operators.multimodal import chunk_audio, media_table

        df = spark.createDataFrame(
            [(1, b"0123456789"), (2, b"abc")], "doc_id long, payload binary"
        )
        m = media_table(df, "doc_id", "payload", "audio/wav")
        out = chunk_audio(m, bytes_per_chunk=4).collect()
        got = {(r["id"], r["chunk_idx"]): (bytes(r["chunk"]), r["n_bytes"]) for r in out}
        assert got == {
            (1, 0): (b"0123", 4),
            (1, 1): (b"4567", 4),
            (1, 2): (b"89", 2),
            (2, 0): (b"abc", 3),
        }


class TestMediaPhash:
    def test_identical_payloads_hamming_zero(self, spark):
        from functools import partial

        from database_replicator_spark.operators.multimodal import (
            fake_decode,
            media_phash,
            media_table,
            phash_pairs,
        )

        rows = [
            (1, b"same bytes of media payload content"),
            (2, b"same bytes of media payload content"),
            (3, b"a completely different media payload"),
        ]
        df = spark.createDataFrame(rows, "id long, payload binary")
        media = media_table(df, "id", "payload", "image/png")
        hashes = media_phash(media, decoder=partial(fake_decode, dim=48), dim=48)
        got = {r["id"]: r["phash"] for r in hashes.collect()}
        assert got[1] == got[2] and got[1] != got[3]
        pairs = phash_pairs(hashes, max_hamming=6).collect()
        assert [(r["id1"], r["id2"], r["hamming"]) for r in pairs] == [(1, 2, 0)]

    def test_banding_finds_low_hamming_neighbors(self, spark):
        """Planted hash pairs within n_bands-1 bit flips are ALWAYS found
        (pigeonhole guarantee); the verify step reports exact distance."""
        rows = [
            (1, 0b101010101010101010101010101010101010101010101010),
            (2, 0b101010101010101010101010101010101010101010101011),  # 1 flip
            (3, 0b101010101010101010101010101010101010101010100110),  # 2 flips
            (4, 0b010101010101010101010101010101010101010101010101),  # far
        ]
        df = spark.createDataFrame(rows, "id long, phash long")
        from database_replicator_spark.operators.multimodal import phash_pairs

        got = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in phash_pairs(df, max_hamming=4).collect()
        }
        assert got[(1, 2)] == 1
        assert got[(1, 3)] == 2
        assert got[(2, 3)] == 3
        assert not any(4 in k for k in got)


class TestPhashDedupTier:
    """Round-10: the image near-dup tier — hot-bucket guard, locality of
    byte_decode, and composition with the cluster/survivor machinery."""

    def _hashes(self, spark, rows):
        df = spark.createDataFrame(rows, "id long, phash long")
        return df

    def test_hot_bucket_guard_drops_degenerate_bucket(self, spark):
        from database_replicator_spark.operators.multimodal import phash_pairs

        # 30 identical hashes: every band bucket holds all 30 → with a
        # cap of 10 ALL pairs vanish; two distinct near-dup ids outside
        # the blob survive.
        rows = [(i, 0xAAAAAAAAAAAA) for i in range(30)]
        rows += [(100, 0x155555555555), (101, 0x155555555554)]  # hamming 1
        df = self._hashes(spark, rows)
        got = phash_pairs(df, max_hamming=6, max_bucket_size=10).collect()
        assert [(r["id1"], r["id2"], r["hamming"]) for r in got] == [
            (100, 101, 1)
        ]
        # cap off: the blob's 435 pairs come back
        allp = phash_pairs(df, max_hamming=6, max_bucket_size=None).count()
        assert allp == 30 * 29 // 2 + 1

    def test_byte_decode_locality(self, spark):
        """One perturbed byte moves the phash by a few bits, not ~dim/2 —
        the property fake_decode (md5 chain) deliberately lacks."""
        from database_replicator_spark.operators.multimodal import (
            byte_decode,
            fake_decode,
            media_phash,
            media_table,
        )
        from functools import partial

        base = b"the quick brown fox jumps over the lazy dog pad!"  # 48B
        pert = b"the q#ick brown fox jumps over the lazy dog pad!"
        assert len(base) == len(pert) == 48
        df = spark.createDataFrame(
            [(1, base), (2, pert)], "id long, payload binary"
        )
        media = media_table(df, "id", "payload", "image/x-gray8")

        def ham(decoder):
            got = {
                r["id"]: r["phash"]
                for r in media_phash(media, decoder=decoder, dim=48).collect()
            }
            return bin(got[1] ^ got[2]).count("1")

        assert ham(byte_decode) <= 6
        assert ham(partial(fake_decode, dim=48)) > 10

    def test_composes_with_cluster_survivor_machinery(self, spark):
        """phash pairs → connected components → select_canonicals: the
        image tier rides the same dedup backend as text."""
        from database_replicator_spark.operators.corpus import (
            connected_components,
            select_canonicals,
        )
        from database_replicator_spark.operators.multimodal import phash_pairs

        rows = [
            (1, 0b1010101010101010),
            (2, 0b1010101010101011),  # pairs with 1
            (3, 0b1010101010101111),  # pairs with 2 (and 1 at ham 2)
            (9, 0b0101010101010100),  # isolated
        ]
        df = self._hashes(spark, rows)
        pairs = phash_pairs(df, max_hamming=2, dim=16, n_bands=4)
        nodes = df.selectExpr("id as node")
        labels = connected_components(
            nodes, pairs, id_col="node", src_col="id1", dst_col="id2"
        )
        docs = df.selectExpr("id as doc_id")
        canon = select_canonicals(labels, docs).collect()
        assert {r["canonical_id"] for r in canon} == {1, 9}
        assert {r["canonical_id"]: r["cluster_size"] for r in canon} == {
            1: 3,
            9: 1,
        }


class TestMediaDhash:
    def _hash_of(self, spark, payloads, dim):
        from database_replicator_spark.operators.multimodal import (
            byte_decode,
            media_dhash,
            media_table,
        )

        df = spark.createDataFrame(
            list(enumerate(payloads)), "id long, payload binary"
        )
        media = media_table(df, "id", "payload", "image/x-gray8")
        return {
            r["id"]: r["phash"]
            for r in media_dhash(media, decoder=byte_decode, dim=dim).collect()
        }

    def test_one_byte_flips_at_most_two_bits(self, spark):
        base = bytes(range(40, 89))  # 49 strictly increasing pixels
        for j in range(1, 48):
            pert = bytearray(base)
            pert[j] = 0  # crater one pixel
            got = self._hash_of(spark, [base, bytes(pert)], dim=49)
            flips = bin(got[0] ^ got[1]).count("1")
            assert flips <= 2, (j, flips)

    def test_brightness_shift_invariant_mean_hash_is_not(self, spark):
        from functools import partial

        base = bytes((i * 37) % 200 for i in range(49))
        brighter = bytes(b + 55 for b in base)
        got = self._hash_of(spark, [base, brighter], dim=49)
        assert got[0] == got[1]  # gradient signs unchanged

    def test_monotone_ramp_sets_all_bits(self, spark):
        got = self._hash_of(spark, [bytes(range(49))], dim=49)
        assert got[0] == (1 << 48) - 1
        got = self._hash_of(spark, [bytes(range(48, -1, -1))], dim=49)
        assert got[0] == 0


class TestMediaDctPhash:
    def _hash_of(self, spark, payloads):
        from database_replicator_spark.operators.multimodal import (
            byte_decode,
            media_dct_phash,
            media_table,
        )

        df = spark.createDataFrame(
            list(enumerate(payloads)), "id long, payload binary"
        )
        media = media_table(df, "id", "payload", "image/x-gray8")
        return {
            r["id"]: r["phash"]
            for r in media_dct_phash(media, decoder=byte_decode).collect()
        }

    @staticmethod
    def _reference(pixels):
        """Driver-side numpy replay of the documented pHash pipeline."""
        import numpy as np

        side, keep = 8, 8
        j = np.arange(side)
        basis = np.cos((2 * j[None, :] + 1) * j[:, None] * np.pi / (2 * side))
        basis *= np.sqrt(2.0 / side)
        basis[0, :] = np.sqrt(1.0 / side)
        img = np.array(pixels, dtype=np.float64).reshape(side, side)
        coef = basis @ img @ basis.T
        low = coef[:keep, :keep].reshape(-1)[1:]
        med = np.median(low)
        return int(((low > med).astype(np.int64) << np.arange(63)).sum())

    def test_matches_python_replay(self, spark):
        payloads = [
            bytes((i * 37 + k * 11) % 251 for i in range(64)) for k in range(5)
        ]
        got = self._hash_of(spark, payloads)
        for k, p in enumerate(payloads):
            assert got[k] == self._reference(list(p)), k

    def test_brightness_and_contrast_invariance(self, spark):
        base = [((i * 53) % 100) + 40 for i in range(64)]  # pixels 40..139
        brighter = [p + 60 for p in base]  # DC-only shift
        doubled = [p * 1 for p in base]  # identity control
        got = {
            "base": self._reference(base),
            "brighter": self._reference(brighter),
            "scaled": self._reference([p * 3 for p in base]),
        }
        assert got["base"] == got["brighter"] == got["scaled"]
        # and the distributed path agrees on the offset pair (bytes cap
        # at 255, so scale is replay-only)
        dist = self._hash_of(
            spark, [bytes(base), bytes(brighter)]
        )
        assert dist[0] == dist[1] == got["base"]

    def test_pairs_compose_with_3_band_split(self, spark):
        from database_replicator_spark.operators.multimodal import phash_pairs

        base = bytes((i * 29) % 240 for i in range(64))
        pert = bytearray(base)
        pert[13] ^= 0x48
        got = self._hash_of(spark, [base, bytes(pert), bytes(reversed(base))])
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(k, v) for k, v in got.items()], "id long, phash long"
        )
        pairs = {
            (r["id1"], r["id2"]): r["hamming"]
            for r in phash_pairs(
                df, max_hamming=14, dim=63, n_bands=3
            ).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] <= 14


class TestVideoPhashSignature:
    def _media(self, spark, payloads, duration=3000):
        from database_replicator_spark.operators.multimodal import media_table

        df = spark.createDataFrame(
            list(enumerate(payloads)), "vid long, payload binary"
        )
        m = media_table(df, "vid", "payload", "video/x-fake")
        return m.withColumn(
            "meta",
            F.struct(
                F.col("meta.mime"),
                F.col("meta.n_bytes"),
                F.col("meta.width"),
                F.col("meta.height"),
                F.lit(duration).cast("long").alias("duration_ms"),
            ),
        )

    @staticmethod
    def _reference(payload, every=1000, duration=3000):
        from database_replicator_spark.operators.multimodal import (
            fake_frame_extract,
        )

        sig = 0
        for idx, ts in enumerate(range(0, duration + 1, every)):
            fr = fake_frame_extract(payload, ts)
            fh = sum(
                1 << i for i in range(15) if fr[i + 1] > fr[i]
            )
            sig |= fh << (15 * idx)
        return sig

    def test_matches_python_replay(self, spark):
        from database_replicator_spark.operators.multimodal import (
            fake_frame_extract,
            video_phash_signature,
        )

        payloads = [
            bytes((i * 31 + k * 7) % 251 for i in range(60 + k))
            for k in range(4)
        ]
        got = {
            r["id"]: r["phash"]
            for r in video_phash_signature(
                self._media(spark, payloads), extractor=fake_frame_extract
            ).collect()
        }
        for k, p in enumerate(payloads):
            assert got[k] == self._reference(p), k

    def test_short_clips_dropped_not_padded(self, spark):
        from database_replicator_spark.operators.multimodal import (
            fake_frame_extract,
            video_phash_signature,
        )

        m = self._media(spark, [bytes(range(64))], duration=1000)  # 2 frames
        assert (
            video_phash_signature(m, extractor=fake_frame_extract).count() == 0
        )

    def test_partial_match_shares_unperturbed_frame_bands(self, spark):
        """A mid-payload edit perturbs only covering frame windows: the
        pair still shares ≥1 frame band and verifies at low hamming."""
        from database_replicator_spark.operators.multimodal import (
            fake_frame_extract,
            phash_pairs,
            video_phash_signature,
        )

        base = bytes((i * 13) % 199 for i in range(120))
        pert = bytearray(base)
        pert[20] ^= 0x7F
        sigs = video_phash_signature(
            self._media(spark, [base, bytes(pert)]),
            extractor=fake_frame_extract,
        )
        pairs = phash_pairs(
            sigs, max_hamming=8, dim=60, n_bands=4
        ).collect()
        assert len(pairs) == 1 and pairs[0]["hamming"] <= 8


class TestAudioFingerprint:
    NEED = 13 * 18

    def _sig(self, spark, payloads):
        from database_replicator_spark.operators.multimodal import (
            audio_fingerprint,
            media_table,
        )

        df = spark.createDataFrame(
            list(enumerate(payloads)), "aid long, payload binary"
        )
        m = media_table(df, "aid", "payload", "audio/x-pcm8")
        return {r["id"]: r["phash"] for r in audio_fingerprint(m).collect()}

    @staticmethod
    def _reference(payload):
        e = [
            sum(payload[k * 18 + m * 3 + j] for j in range(3))
            for k in range(13)
            for m in range(6)
        ]

        def E(k, m):
            return e[k * 6 + m]

        sig = 0
        for i in range(60):
            k, m = i // 5 + 1, i % 5
            dd = (E(k, m) - E(k, m + 1)) - (E(k - 1, m) - E(k - 1, m + 1))
            if dd > 0:
                sig |= 1 << i
        return sig

    def test_matches_python_replay(self, spark):
        payloads = [
            bytes((i * 41 + k * 3) % 251 for i in range(self.NEED))
            for k in range(4)
        ]
        got = self._sig(spark, payloads)
        for k, p in enumerate(payloads):
            assert got[k] == self._reference(p), k

    def test_gain_invariance_and_short_drop(self, spark):
        base = bytes((i * 23) % 180 for i in range(self.NEED))
        louder = bytes(b + 70 for b in base)  # constant gain offset
        short = bytes(range(100))
        got = self._sig(spark, [base, louder, short])
        assert got[0] == got[1]  # offsets cancel in both differences
        assert 2 not in got  # incomplete frames dropped by contract

    def test_one_byte_edit_is_local(self, spark):
        base = bytes((i * 23) % 180 for i in range(self.NEED))
        pert = bytearray(base)
        pert[50] = 255  # max-amplitude spike: guaranteed sign crossings
        got = self._sig(spark, [base, bytes(pert)])
        flips = bin(got[0] ^ got[1]).count("1")
        # one band energy moves → only its 4 adjacent double-difference
        # bits can cross zero; the replay pins the exact count (2 here)
        assert 1 <= flips <= 4
        assert flips == bin(
            self._reference(base) ^ self._reference(bytes(pert))
        ).count("1")


class TestMediaDedupPipeline:
    PAYLOADS = [
        (1, b"the quick brown fox jumps over the lazy dog pad!"),  # 48B
        (2, b"the quick brown fox jumps over the lazy dog pad!"),  # exact dup
        (3, b"the q#ick brown fox jumps over the lazy dog pad!"),  # near dup
        (4, b"completely different content that shares nothing"),
    ]

    def test_clusters_and_survivors(self, spark):
        from database_replicator_spark.operators.multimodal import media_dedup

        df = spark.createDataFrame(self.PAYLOADS, "id long, payload binary")
        got = {
            r["id"]: r
            for r in media_dedup(df, hash_family="dhash").collect()
        }
        assert len(got) == 4
        # 1,2,3 cluster together; 1 is the survivor
        assert got[1]["cluster_id"] == got[2]["cluster_id"] == got[3]["cluster_id"]
        assert got[4]["cluster_id"] != got[1]["cluster_id"]
        assert [got[i]["kept"] for i in (1, 2, 3, 4)] == [True, False, False, True]
        assert got[1]["cluster_size"] == 3 and got[4]["cluster_size"] == 1

    def test_all_three_families_run(self, spark):
        from database_replicator_spark.operators.multimodal import media_dedup

        df = spark.createDataFrame(self.PAYLOADS, "id long, payload binary")
        for fam in ("ahash", "dhash", "dct"):
            out = media_dedup(df, hash_family=fam).collect()
            assert len(out) == 4, fam
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown hash_family"):
            media_dedup(df, hash_family="simhash")

    def test_cli_verb_end_to_end(self, spark, tmp_path, capsys):
        import json as _json

        from database_replicator_spark.cli import main

        src = tmp_path / "media"
        src.mkdir()
        df = spark.createDataFrame(self.PAYLOADS, "id long, payload binary")
        df.write.parquet(str(src / "blobs.parquet"))
        rc = main([
            "media-dedup", "--source", str(src), "--table", "blobs",
            "--out", str(tmp_path / "labeled"),
        ])
        out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rc == 0 and out["ok"]
        assert out == {
            "ok": True, "hash": "dhash", "n": 4, "n_kept": 2,
            "n_dup": 2, "n_clusters": 2, "out": str(tmp_path / "labeled"),
        }


class TestPhashPairsCheckpointKnob:
    def test_checkpoint_off_output_identical(self, spark):
        from database_replicator_spark.operators.multimodal import phash_pairs

        rows = [(i, (i * 37) % (1 << 48)) for i in range(60)]
        rows += [(100, 0x155555555555), (101, 0x155555555554)]
        df = spark.createDataFrame(rows, "id long, phash long")
        on = sorted(map(tuple, phash_pairs(df, max_hamming=6).collect()))
        off = sorted(
            map(
                tuple,
                phash_pairs(df, max_hamming=6, checkpoint_hashes=False).collect(),
            )
        )
        assert on == off and (100, 101, 1) in on
