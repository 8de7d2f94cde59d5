"""Real media codec tests: BMP/netpbm/WAV/FRMS round-trips, DSP
features, and the upgraded multimodal operators doing genuine codec
work inside mapInPandas (decode -> resize -> re-encode, real frame
extraction, tone-frequency recovery)."""

from __future__ import annotations

import numpy as np
import pytest

from bingo2sql_spark.functions import media as M


def _test_card(h: int, w: int, seed: int = 0) -> np.ndarray:
    return ((np.arange(h * w * 3, dtype=np.uint64) * 7 + seed) % 256).astype(
        np.uint8
    ).reshape(h, w, 3)


class TestCodecs:
    def test_bmp_round_trip_exact(self):
        arr = _test_card(33, 21)  # odd width exercises the 4-byte row padding
        data = M.encode_bmp(arr)
        assert M.sniff_mime(data) == "image/bmp"
        assert (M.decode_bmp(data) == arr).all()

    def test_bmp_top_down_and_32bpp(self):
        # hand-build a 2x2 top-down 32bpp BMP (BGRA) and decode it
        import struct

        px = bytes([1, 2, 3, 255, 4, 5, 6, 255, 7, 8, 9, 255, 10, 11, 12, 255])
        header = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 32, 0, len(px), 0, 0, 0, 0)
        arr = M.decode_bmp(header + dib + px)
        # first pixel row is the FIRST row (top-down), BGR -> RGB
        assert arr[0, 0].tolist() == [3, 2, 1]
        assert arr[1, 1].tolist() == [12, 11, 10]

    def test_ppm_pgm_round_trip(self):
        arr = _test_card(5, 9)
        assert (M.decode_ppm(M.encode_ppm(arr)) == arr).all()
        gray = arr[:, :, 0]
        back = M.decode_ppm(M.encode_ppm(gray))
        assert back.shape == (5, 9, 3)
        assert (back[:, :, 0] == gray).all() and (back[:, :, 2] == gray).all()

    def test_ppm_header_comments(self):
        arr = _test_card(2, 3)
        body = M.encode_ppm(arr)
        commented = b"P6\n# a comment\n3 2\n# another\n255\n" + body.split(b"\n", 3)[3]
        assert (M.decode_ppm(commented) == arr).all()

    def test_resize_nearest_semantics(self):
        # 2x2 checkerboard doubled -> each pixel becomes a 2x2 block
        arr = np.array(
            [[[0, 0, 0], [255, 255, 255]], [[255, 255, 255], [0, 0, 0]]], dtype=np.uint8
        )
        up = M.resize_nearest(arr, 4, 4)
        assert up.shape == (4, 4, 3)
        assert (up[:2, :2] == 0).all() and (up[:2, 2:] == 255).all()
        down = M.resize_nearest(up, 2, 2)
        assert (down == arr).all()

    def test_wav_round_trip_and_widths(self):
        t = np.arange(2000, dtype=np.float32) / 4000
        tone = (np.sin(2 * np.pi * 300 * t) * 0.5 * 32767).astype(np.int16)
        s, rate = M.decode_wav(M.encode_wav(tone, 4000))
        assert rate == 4000 and len(s) == 2000
        assert np.allclose(s * 32768.0, tone, atol=1.0)
        assert M.sniff_mime(M.encode_wav(tone, 4000)) == "audio/wav"

    def test_wav_stereo(self):
        stereo = np.stack(
            [np.full(100, 8000, np.int16), np.full(100, -8000, np.int16)], axis=1
        )
        s, rate = M.decode_wav(M.encode_wav(stereo, 8000))
        assert s.shape == (100, 2)
        assert (s[:, 0] > 0).all() and (s[:, 1] < 0).all()

    def test_spectral_centroid_recovers_tone(self):
        rate = 4000
        for freq in (250, 700, 1500):
            t = np.arange(rate, dtype=np.float32) / rate
            f = M.audio_features(np.sin(2 * np.pi * freq * t), rate)
            assert abs(f["centroid_hz"] - freq) < 50, (freq, f["centroid_hz"])
        # rms of a 0.5-amplitude sine is 0.5/sqrt(2)
        f = M.audio_features(0.5 * np.sin(2 * np.pi * 440 * t), rate)
        assert abs(f["rms"] - 0.3536) < 0.01

    def test_frms_container_and_seek(self):
        a, b = M.encode_bmp(_test_card(4, 4, 1)), M.encode_bmp(_test_card(4, 4, 2))
        data = M.pack_frames([(0, a), (100, b)])
        assert M.sniff_mime(data) == "video/x-frms"
        assert M.unpack_frames(data) == [(0, a), (100, b)]
        assert M.frame_at(data, 0) == a
        assert M.frame_at(data, 99) == a
        assert M.frame_at(data, 100) == b  # seek: latest frame <= ts
        assert M.frame_at(data, 10_000) == b

    def test_sniff_compressed_formats_route_to_gated_libs(self):
        assert M.sniff_mime(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8) == "image/png"
        assert M.sniff_mime(b"\xff\xd8\xff\xe0" + b"\x00" * 8) == "image/jpeg"
        assert M.sniff_mime(b"\x00\x00\x00\x20ftypisom") == "video/mp4"
        assert M.sniff_mime(b"garbage!") is None

    def test_decode_errors_are_loud(self):
        with pytest.raises(ValueError):
            M.decode_bmp(b"BMxx")
        with pytest.raises(ValueError):
            M.decode_image_np(b"\xff\xd8\xff\xe0 jpeg bytes")
        from bingo2sql_spark.operators.multimodal import decode_audio, decode_image

        with pytest.raises(NotImplementedError, match="PIL"):
            decode_image(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
        with pytest.raises(NotImplementedError, match="soundfile"):
            decode_audio(b"fLaC" + b"\x00" * 16)


class TestMalformedMedia:
    """ADVICE r6: malformed-but-sniffable payloads must degrade, never
    crash a Spark task — media.py raises ValueError uniformly, and the
    multimodal operators fall back (byte stats / pass-through / byte
    slices) on corrupt rows."""

    def _corrupt_payloads(self):
        import struct

        bmp = M.encode_bmp(_test_card(6, 8))[:40]  # sniffs BMP, truncated
        wav = b"RIFF" + struct.pack("<I", 100) + b"WAVE" + b"junkjunk"
        frms_trunc = b"FRMS" + struct.pack("<I", 5)  # count 5, zero frames
        frms_overrun = (
            b"FRMS" + struct.pack("<I", 1) + struct.pack("<QI", 0, 9999) + b"xx"
        )
        return bmp, wav, frms_trunc, frms_overrun

    def test_media_codecs_raise_valueerror_uniformly(self):
        bmp, wav, frms_trunc, frms_overrun = self._corrupt_payloads()
        with pytest.raises(ValueError):
            M.decode_bmp(bmp)
        with pytest.raises(ValueError):
            M.decode_wav(wav)
        with pytest.raises(ValueError, match="truncated FRMS"):
            M.unpack_frames(frms_trunc)
        # length field past EOF must be loud, never silently-short frames
        with pytest.raises(ValueError, match="truncated FRMS"):
            M.unpack_frames(frms_overrun)
        with pytest.raises(ValueError, match="truncated FRMS"):
            M.frame_at(frms_trunc, 0)

    def test_corrupt_rows_never_fail_feature_stage(self, spark):
        from bingo2sql_spark.operators.multimodal import (
            FEATURE_DIM,
            extract_features,
        )

        bmp, wav, frms_trunc, frms_overrun = self._corrupt_payloads()
        media = spark.createDataFrame(
            [
                (1, "image", bytearray(bmp)),
                (2, "audio", bytearray(wav)),
                (3, "video", bytearray(frms_trunc)),
                (4, "video", bytearray(frms_overrun)),
            ],
            "media_id long, kind string, payload binary",
        )
        feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
        assert set(feats) == {1, 2, 3, 4}
        for f in feats.values():
            assert len(f) == FEATURE_DIM  # byte-stat fallback, no crash

    def test_corrupt_frms_falls_back_to_byte_slices(self, spark):
        from bingo2sql_spark.operators.multimodal import sample_frames

        _, _, frms_trunc, frms_overrun = self._corrupt_payloads()
        media = spark.createDataFrame(
            [
                (1, "video", bytearray(frms_trunc), {"mime": "video/x-frms", "width": 8, "height": 6, "duration_ms": 200}),
                (2, "video", bytearray(frms_overrun), {"mime": "video/x-frms", "width": 8, "height": 6, "duration_ms": 200}),
            ],
            "media_id long, kind string, payload binary, "
            "meta struct<mime string, width int, height int, duration_ms long>",
        )
        rows = sample_frames(media, every_ms=50, max_frames=4).collect()
        assert len(rows) == 8  # fan-out shape intact despite corrupt bodies
        for r in rows:
            src = frms_trunc if r["media_id"] == 1 else frms_overrun
            i = r["frame_idx"]
            assert bytes(r["frame_payload"]) == src[i : i + 16]

    def test_corrupt_image_passes_through_resize(self, spark):
        from bingo2sql_spark.operators.multimodal import resize_images

        bmp, _, _, _ = self._corrupt_payloads()
        media = spark.createDataFrame(
            [(1, "image", bytearray(bmp), {"mime": "image/bmp", "width": 8, "height": 6, "duration_ms": 0})],
            "media_id long, kind string, payload binary, "
            "meta struct<mime string, width int, height int, duration_ms long>",
        )
        (row,) = resize_images(media, 16, 12).collect()
        assert bytes(row["payload"]) == bmp  # untouched
        assert row["meta"]["width"] == 16 and row["meta"]["height"] == 12


class TestMultimodalOps:
    def _media(self, spark, n=12):
        from bingo2sql_spark.operators.multimodal import synth_media

        docs = spark.createDataFrame(
            [(i, "x" * (10 + i), 10 + i) for i in range(n)],
            ["doc_id", "text", "n_chars"],
        )
        return synth_media(docs)

    def test_synth_media_payloads_really_decode(self, spark):
        from bingo2sql_spark.operators.multimodal import decode_image

        rows = self._media(spark).collect()
        kinds = {r["kind"] for r in rows}
        assert kinds == {"image", "audio", "video"}
        for r in rows:
            data = bytes(r["payload"])
            if r["kind"] == "image":
                arr = decode_image(data)
                assert arr.shape == (r["meta"]["height"], r["meta"]["width"], 3)
            elif r["kind"] == "audio":
                s, rate = M.decode_wav(data)
                assert rate == 4000 and len(s) > 0
            else:
                frames = M.unpack_frames(data)
                assert frames and all(
                    M.sniff_mime(p) == "image/bmp" for _, p in frames
                )

    def test_resize_really_resizes_pixels(self, spark):
        from bingo2sql_spark.operators.multimodal import resize_images

        media = self._media(spark)
        out = {r["media_id"]: r for r in resize_images(media, 16, 12).collect()}
        src = {r["media_id"]: r for r in media.collect()}
        for mid, r in out.items():
            assert r["meta"]["width"] == 16 and r["meta"]["height"] == 12
            if r["kind"] == "image":
                arr = M.decode_bmp(bytes(r["payload"]))
                assert arr.shape == (12, 16, 3)
                # pixel-exact vs resizing the source locally
                expect = M.resize_nearest(
                    M.decode_image_np(bytes(src[mid]["payload"])), 16, 12
                )
                assert (arr == expect).all()
            else:
                # non-images pass through payload-untouched
                assert bytes(r["payload"]) == bytes(src[mid]["payload"])

    def test_sample_frames_returns_real_bmp_frames(self, spark):
        from bingo2sql_spark.operators.multimodal import sample_frames

        media = self._media(spark).filter("kind = 'video'")
        src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
        for r in sample_frames(media, every_ms=50, max_frames=4).collect():
            frame = bytes(r["frame_payload"])
            assert M.sniff_mime(frame) == "image/bmp"
            assert frame == M.frame_at(src[r["media_id"]], r["ts_ms"])
            M.decode_bmp(frame)  # decodes clean

    def test_features_recover_audio_tone_and_image_dims(self, spark):
        from bingo2sql_spark.operators.multimodal import extract_features

        media = self._media(spark, n=18)
        feats = {r["media_id"]: r["features"] for r in extract_features(media).collect()}
        metas = {r["media_id"]: r for r in media.collect()}
        for mid, f in feats.items():
            kind = metas[mid]["kind"]
            assert len(f) == 8
            if kind == "image":
                assert f[0] == metas[mid]["meta"]["width"]
                assert f[1] == metas[mid]["meta"]["height"]
            elif kind == "audio":
                expected_freq = 200 + (mid % 20) * 40
                assert f[0] == 4000.0  # rate
                assert abs(f[4] - expected_freq) < 60  # spectral centroid
            else:
                assert f[0] >= 1  # real frame count
