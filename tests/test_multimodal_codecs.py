"""Real pure-numpy codecs (WAV/PCM, PPM/PGM) + sniffing feature path."""

import numpy as np
import pytest

from graph_data_science_spark.pipeline.multimodal import (
    _area_resize,
    audio_features,
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    extract_features,
    resize_ppm_images,
    synthesize_real_media,
)


def test_wav_roundtrip():
    rate = 8000
    t = np.arange(rate) / rate
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    back, r = decode_wav(encode_wav(x, rate))
    assert r == rate
    assert len(back) == len(x)
    assert np.max(np.abs(back - x)) < 1e-4  # 16-bit quantization


def test_wav_stereo_downmix_and_8bit():
    import struct

    # hand-built stereo 8-bit WAV: L=+1, R=-1 -> mono 0
    data = bytes([255, 0] * 100)  # unsigned 8-bit: 255~+1, 0~-1
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, 2, 4000, 8000, 2, 8)
    payload = (
        struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
        + fmt + struct.pack("<4sI", b"data", len(data)) + data
    )
    x, rate = decode_wav(payload)
    assert rate == 4000
    assert len(x) == 100
    assert np.max(np.abs(x)) < 0.01  # L and R cancel


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all, definitely")


def test_ppm_roundtrip_and_comments():
    img = np.arange(24 * 32 * 3, dtype=np.uint64).astype(np.uint8)
    img = img.reshape(24, 32, 3)
    back = decode_ppm(encode_ppm(img))
    assert back.shape == (24, 32, 3)
    assert np.array_equal(back, img)
    # header comments are legal PPM
    with_comment = b"P6\n# made by hand\n2 2\n255\n" + bytes(12)
    assert decode_ppm(with_comment).shape == (2, 2, 3)


def test_pgm_grayscale():
    img = np.full((5, 7), 200, dtype=np.uint8)
    back = decode_ppm(encode_ppm(img))
    assert back.shape == (5, 7)
    assert back.dtype == np.uint8


def test_area_resize_preserves_mean():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:4] = 100  # top half 100, bottom half 0
    small = _area_resize(img, 4, 4)
    assert small.shape == (4, 4, 3)
    assert small[:2].mean() == 100 and small[2:].mean() == 0
    up = _area_resize(img, 16, 16)  # upscale: nearest
    assert up.shape == (16, 16, 3)


def test_audio_features_sine(spark):
    media = synthesize_real_media(spark, 10, kind="wav")
    feats = {r.media_id: r for r in audio_features(media).collect()}
    assert len(feats) == 10
    for i, r in feats.items():
        planted = 200.0 + (i % 10) * 100.0
        assert abs(r.spectral_centroid_hz - planted) < 30.0
        assert abs(r.rms - 0.5 / np.sqrt(2)) < 0.01
        assert abs(r.duration_s - 0.25) < 0.01


def test_resize_ppm_via_spark(spark):
    media = synthesize_real_media(spark, 6, kind="ppm")
    out = resize_ppm_images(media, width=16, height=12).collect()
    assert len(out) == 6
    for r in out:
        img = decode_ppm(bytes(r.payload))
        assert img.shape == (12, 16, 3)
        assert r.width == 16 and r.height == 12


def test_extract_features_sniffs_real_formats(spark):
    wav = synthesize_real_media(spark, 4, kind="wav")
    ppm = synthesize_real_media(spark, 4, kind="ppm")
    for media in (wav, ppm):
        rows = extract_features(media, dim=8, use_stub=False).collect()
        assert len(rows) == 4
        assert all(len(r.feature) == 8 for r in rows)


def test_extract_features_unknown_raises_without_stub(spark):
    from graph_data_science_spark.pipeline.multimodal import synthesize_media

    fake = synthesize_media(spark, 3)  # sha256 payloads: no magic
    with pytest.raises(Exception, match="ffmpeg"):
        extract_features(fake, use_stub=False).collect()
    # stub path still works for unknown payloads
    assert extract_features(fake, use_stub=True).count() == 3


class TestPngCodec:
    def test_roundtrip_all_filters_and_colortypes(self):
        import numpy as np

        from graph_data_science_spark.pipeline.multimodal import (
            decode_png,
            encode_png,
        )

        rng = np.random.default_rng(5)
        for ch in (1, 2, 3, 4):
            shape = (13, 17) if ch == 1 else (13, 17, ch)
            img = rng.integers(0, 256, size=shape, dtype=np.uint8)
            for ft in range(5):
                out = decode_png(encode_png(img, filter_type=ft))
                assert out.shape == img.shape, (ch, ft)
                assert (out == img).all(), (ch, ft)

    def test_compression_is_real_and_sniffed(self):
        import numpy as np

        from graph_data_science_spark.pipeline.multimodal import (
            _sniff,
            encode_png,
        )

        flat = np.zeros((64, 64, 3), dtype=np.uint8)  # compresses hard
        payload = encode_png(flat)
        assert _sniff(payload) == "png"
        assert len(payload) < flat.size // 10

    def test_palette_rejected(self):
        import struct
        import zlib

        import pytest

        from graph_data_science_spark.pipeline.multimodal import (
            _PNG_SIG,
            _png_chunk,
            decode_png,
        )

        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)  # colortype 3
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
            + _png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            decode_png(payload)

    def test_gradient_png_stats_match_ppm(self, spark):
        """PNG and PPM paths over the same gradient must produce
        identical resize stats (the codec is lossless)."""
        from graph_data_science_spark.pipeline.multimodal import (
            png_resize_stats,
            ppm_resize_stats,
            synthesize_gradient_png,
            synthesize_gradient_ppm,
        )

        ids = spark.range(40).selectExpr("id AS doc_id")
        a = sorted(
            tuple(r) for r in ppm_resize_stats(
                synthesize_gradient_ppm(ids, width=32, height=24),
                width=8, height=6,
            ).collect()
        )
        b = sorted(
            tuple(r) for r in png_resize_stats(
                synthesize_gradient_png(ids, width=32, height=24),
                width=8, height=6,
            ).collect()
        )
        assert a == b


class TestJpegCodec:
    @staticmethod
    def _psnr(a, b):
        import numpy as np

        mse = np.mean(
            (a.astype(np.float64) - b.astype(np.float64)) ** 2
        )
        return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)

    def test_constant_even_tiles_exact_at_q50(self):
        """The oracle-exactness contract: grayscale constant 8x8 tiles
        with even values survive encode->decode bit-exactly at quality
        50 (same formula as the multimodal_jpeg contract row)."""
        import numpy as np

        from graph_data_science_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        ty = np.arange(3)[:, None]
        tx = np.arange(4)[None, :]
        for d in (0, 7, 123, 100_000):
            tiles = ((5 * tx + 9 * ty + d) % 128) * 2
            img = np.repeat(np.repeat(tiles, 8, 0), 8, 1).astype(
                np.uint8
            )
            out = decode_jpeg(encode_jpeg(img, quality=50))
            assert out.dtype == np.uint8 and out.shape == img.shape
            assert np.array_equal(out, img), d

    def test_gray_and_rgb_roundtrip_psnr(self):
        import numpy as np

        from graph_data_science_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        h, w = 48, 64
        y, x = np.mgrid[0:h, 0:w]
        gray = (128 + 100 * np.sin(x / 9) * np.cos(y / 7)).astype(
            np.uint8
        )
        out = decode_jpeg(encode_jpeg(gray, quality=90))
        assert self._psnr(gray, out) > 40
        rgb = np.stack(
            [
                (128 + 100 * np.sin(x / 20)).astype(np.uint8),
                (128 + 100 * np.sin(y / 15)).astype(np.uint8),
                (128 + 80 * np.cos((x + y) / 25)).astype(np.uint8),
            ],
            axis=2,
        )
        out444 = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="444"))
        out420 = decode_jpeg(encode_jpeg(rgb, quality=90, subsample="420"))
        assert self._psnr(rgb, out444) > 38
        # 4:2:0 halves chroma resolution; smooth chroma stays close
        assert self._psnr(rgb, out420) > 33

    def test_non_multiple_of_8_dims(self):
        import numpy as np

        rng = np.random.default_rng(11)

        from graph_data_science_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        del rng
        y, x = np.mgrid[0:19, 0:29]
        img = np.stack(
            [
                (128 + 100 * np.sin(x / 10)).astype(np.uint8),
                (128 + 100 * np.sin(y / 8)).astype(np.uint8),
                (128 + 80 * np.cos((x + y) / 12)).astype(np.uint8),
            ],
            axis=2,
        )
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=95, subsample=sub))
            assert out.shape == img.shape, sub
            assert self._psnr(img, out) > 30, sub

    def test_progressive_rejected_and_sniffed(self):
        import struct

        import numpy as np
        import pytest

        from graph_data_science_spark.pipeline.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )
        from graph_data_science_spark.pipeline.multimodal import _sniff

        payload = encode_jpeg(
            np.zeros((8, 8), dtype=np.uint8), quality=75
        )
        assert _sniff(payload) == "jpeg"
        # SOF2 (progressive) right after SOI must raise loudly
        sof2 = b"\xff\xd8\xff\xc2" + struct.pack(">H", 11) + b"\x08" \
            + struct.pack(">HHB", 8, 8, 1) + b"\x01\x11\x00"
        with pytest.raises(NotImplementedError, match="baseline"):
            decode_jpeg(sof2)
        with pytest.raises(ValueError):
            decode_jpeg(b"not a jpeg")

    def test_compression_is_real(self):
        import numpy as np

        from graph_data_science_spark.pipeline.jpeg import encode_jpeg

        flat = np.full((64, 64), 128, dtype=np.uint8)
        assert len(encode_jpeg(flat, quality=75)) < flat.size // 4

    def test_tiled_jpeg_stats_spark(self, spark):
        """Spark-side replay of the multimodal_jpeg contract row: stats
        from decoded JPEG payloads == the direct pixel formula."""
        from graph_data_science_spark.pipeline.multimodal import (
            jpeg_resize_stats,
            synthesize_tiled_jpeg,
        )
        import numpy as np

        ids = spark.range(30).selectExpr("id AS doc_id")
        media = synthesize_tiled_jpeg(ids, width=32, height=24)
        rows = {
            r.media_id: r
            for r in jpeg_resize_stats(media, width=8, height=6).collect()
        }
        ty = np.arange(3)[:, None]
        tx = np.arange(4)[None, :]
        for d in range(30):
            tiles = ((5 * tx + 9 * ty + d) % 128) * 2
            # each tile covers 2x2 output pixels at the 4x downscale
            assert rows[d].pixel_sum == int(tiles.sum()) * 4, d
            assert rows[d].pixel_min == int(tiles.min()), d
            assert rows[d].pixel_max == int(tiles.max()), d

    def test_real_resize_all_formats_spark(self, spark):
        """resize_images(use_stub=False) re-encodes PPM/PNG/JPEG
        payloads at the new dims, decodable in the original format."""
        import numpy as np

        from graph_data_science_spark.pipeline.multimodal import (
            _sniff,
            resize_images,
            synthesize_gradient_png,
            synthesize_gradient_ppm,
            synthesize_tiled_jpeg,
        )

        ids = spark.range(5).selectExpr("id AS doc_id")
        for maker, kind in (
            (synthesize_gradient_ppm, "ppm"),
            (synthesize_gradient_png, "png"),
            (synthesize_tiled_jpeg, "jpeg"),
        ):
            media = maker(ids, width=32, height=24)
            out = resize_images(
                media, width=16, height=12, use_stub=False
            ).collect()
            assert len(out) == 5, kind
            for r in out:
                assert r.width == 16 and r.height == 12, kind
                payload = bytes(r.payload)
                assert _sniff(payload) == kind
                from graph_data_science_spark.pipeline.jpeg import (
                    decode_jpeg,
                )
                from graph_data_science_spark.pipeline.multimodal import (
                    decode_png,
                    decode_ppm,
                )

                dec = {
                    "ppm": decode_ppm,
                    "png": decode_png,
                    "jpeg": decode_jpeg,
                }[kind]
                img = dec(payload)
                assert img.shape[:2] == (12, 16), kind


class TestMjpegAvi:
    def test_container_roundtrip(self):
        import numpy as np

        from graph_data_science_spark.pipeline.jpeg import encode_jpeg
        from graph_data_science_spark.pipeline.multimodal import (
            encode_avi_mjpeg,
            parse_avi_mjpeg,
        )

        frames = [
            encode_jpeg(
                np.full((16, 16), 2 * f + 10, dtype=np.uint8), quality=50
            )
            for f in range(5)
        ]
        avi = encode_avi_mjpeg(frames, fps=4, width=16, height=16)
        assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
        rate, scale, back = parse_avi_mjpeg(avi)
        assert (rate, scale) == (4, 1)
        assert back == frames  # byte-identical payload recovery
        # odd-length frame exercises RIFF word padding
        odd = [b"\xff\xd8\xff" + b"x" * 4]  # 7 bytes
        _, _, b2 = parse_avi_mjpeg(encode_avi_mjpeg(odd, fps=2))
        assert b2 == odd

    def test_rejects_non_avi(self):
        import pytest

        from graph_data_science_spark.pipeline.multimodal import (
            parse_avi_mjpeg,
        )

        with pytest.raises(ValueError):
            parse_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")

    def test_frame_sampling_arithmetic_spark(self, spark):
        """8 frames at 4 fps, sampled every 500 ms -> ts 0..2000
        inclusive, indices (0,2,4,6,7) with the last clamped."""
        from graph_data_science_spark.pipeline.multimodal import (
            sample_frames_mjpeg,
            synthesize_tiled_mjpeg,
        )

        ids = spark.range(3).selectExpr("id AS doc_id")
        media = synthesize_tiled_mjpeg(
            ids, width=32, height=24, n_frames=8, fps=4
        )
        rows = sample_frames_mjpeg(media, every_ms=500).collect()
        by_id = {}
        for r in rows:
            by_id.setdefault(r.media_id, []).append(
                (r.frame_ts_ms, r.frame_index)
            )
        for d in range(3):
            assert sorted(by_id[d]) == [
                (0, 0), (500, 2), (1000, 4), (1500, 6), (2000, 7),
            ]

    def test_frame_stats_match_formula_spark(self, spark):
        """mjpeg_frame_stats == direct tile-formula replay (the
        multimodal_video oracle in python)."""
        import numpy as np

        from graph_data_science_spark.pipeline.multimodal import (
            mjpeg_frame_stats,
            synthesize_tiled_mjpeg,
        )

        ids = spark.range(6).selectExpr("id AS doc_id")
        media = synthesize_tiled_mjpeg(
            ids, width=32, height=24, n_frames=8, fps=4
        )
        rows = mjpeg_frame_stats(media, every_ms=500).collect()
        assert len(rows) == 6 * 5
        ty = np.arange(3)[:, None]
        tx = np.arange(4)[None, :]
        for r in rows:
            tiles = ((5 * tx + 9 * ty + r.media_id + 17 * r.frame_index)
                     % 128) * 2
            assert r.pixel_sum == int(tiles.sum()) * 64
            assert r.pixel_min == int(tiles.min())
            assert r.pixel_max == int(tiles.max())


def test_jpeg_fill_bytes_and_stray_rst_markers():
    """T.81 B.1.1.2: 0xFF fill bytes may precede any marker, and
    TEM/RSTn are standalone (no length field) — externally-produced
    baseline JPEGs use both (round-3 ADVICE item)."""
    import numpy as np

    from graph_data_science_spark.pipeline.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    img = np.arange(64 * 64, dtype=np.uint8).reshape(64, 64)
    payload = encode_jpeg(img)
    base = decode_jpeg(payload)
    # fill byte before the first marker after SOI
    filled = payload[:2] + b"\xff" + payload[2:]
    assert (decode_jpeg(filled) == base).all()
    # standalone TEM marker between header segments
    tem = payload[:2] + b"\xff\x01" + payload[2:]
    assert (decode_jpeg(tem) == base).all()


def test_y4m_roundtrip_and_rejections():
    """Y4M Cmono encode/decode roundtrip is bit-exact; chroma color
    spaces reject loudly (ffmpeg territory, absent in this container)."""
    import numpy as np
    import pytest as _pytest

    from graph_data_science_spark.pipeline.multimodal import (
        encode_y4m,
        parse_y4m,
    )

    frames = [
        ((np.arange(24 * 32, dtype=np.int64).reshape(24, 32) * (f + 1))
         % 256).astype(np.uint8)
        for f in range(3)
    ]
    payload = encode_y4m(frames, fps_num=4)
    num, den, w, h, out = parse_y4m(payload)
    assert (num, den, w, h, len(out)) == (4, 1, 32, 24, 3)
    for a, b in zip(frames, out):
        assert (a == b).all()
    chroma = payload.replace(b"Cmono", b"C420 ", 1)
    with _pytest.raises(NotImplementedError):
        parse_y4m(chroma)
    with _pytest.raises(ValueError):
        parse_y4m(b"RIFFxxxx")
