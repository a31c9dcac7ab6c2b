"""Pure-stdlib media codecs (sources/media_codecs.py) + their
mapInPandas kernels (sources/multimodal.py): real PNG/BMP/WAV parsing
on executors, deterministic-fake fallback for unknown formats."""

from __future__ import annotations

import random
import struct

import pandas as pd
import pytest

from azure_data_engineering_spark.sources import media_codecs as M


class TestPng:
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    def test_roundtrip_every_filter_and_colortype(self, channels, filter_type):
        rng = random.Random(channels * 10 + filter_type)
        w, h = 13, 9
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        enc = M.png_encode(px, w, h, channels=channels, filter_type=filter_type)
        assert M.sniff(enc) == "png"
        W, H, C, out = M.png_decode(enc)
        assert (W, H, C) == (w, h, channels)
        assert bytes(out) == px

    def test_header_only_no_inflate(self):
        enc = M.png_encode(bytes(20), 5, 4, channels=1)
        # corrupt the IDAT body: header parse must still succeed
        broken = bytearray(enc)
        broken[40] ^= 0xFF
        assert M.png_header(bytes(broken)) == (5, 4, 8, 0)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError):
            M.png_decode(b"plainly not a png")
        with pytest.raises(ValueError):
            M.png_header(b"BMnot a png either")

    def test_rejects_wrong_buffer_size(self):
        with pytest.raises(ValueError):
            M.png_encode(bytes(7), 4, 2, channels=1)


class TestBmpWav:
    def test_bmp_header_including_topdown(self):
        bmp = b"BM" + bytes(16) + struct.pack("<ii", 17, -22) + bytes(2) + struct.pack("<H", 24)
        assert M.sniff(bmp) == "bmp"
        assert M.bmp_header(bmp) == (17, 22, 24)

    def test_wav_roundtrip(self):
        samples = struct.pack("<6h", 100, -100, 200, -200, 300, -300)
        wv = M.wav_encode(samples, 8000, channels=1)
        assert M.sniff(wv) == "wav"
        ch, rate, n, width, frames = M.wav_decode(wv)
        assert (ch, rate, n, width) == (1, 8000, 6, 2)
        assert frames == samples

    def test_sniff_unknown(self):
        assert M.sniff(b"hello world, just text") is None


class TestSparkKernels:
    def test_decode_image_metadata_mixed_formats(self, spark):
        """One Arrow batch mixing real PNG, real BMP, and unknown bytes:
        the kernel parses the real ones and falls back to the documented
        fake for the rest — per row, not per partition."""
        from azure_data_engineering_spark.sources.multimodal import decode_image_metadata

        png = M.png_encode(bytes(range(12)) * 3, 6, 2, channels=3)
        bmp = (
            b"BM" + bytes(16) + struct.pack("<ii", 9, 7) + bytes(2) + struct.pack("<H", 8)
        )
        junk = b"not an image at all"
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1, 2, 3], "payload": [png, bmp, junk]})
        )
        rows = {r.id: r for r in decode_image_metadata(df).collect()}
        assert (rows[1].format, rows[1].width, rows[1].height, rows[1].channels) == ("png", 6, 2, 3)
        assert (rows[2].format, rows[2].width, rows[2].height, rows[2].channels) == ("bmp", 9, 7, 1)
        assert rows[3].format == "fake"  # deterministic fallback
        assert rows[3].width == len(junk) % 64 + 1

    def test_image_pixel_stats_matches_source_pixels(self, spark):
        from azure_data_engineering_spark.sources.multimodal import image_pixel_stats

        px = bytes((3 * k + 1) % 256 for k in range(15 * 4))
        df = spark.createDataFrame(
            pd.DataFrame({"id": [7], "payload": [M.png_encode(px, 15, 4, filter_type=4)]})
        )
        r = image_pixel_stats(df).collect()[0]
        assert (r.width, r.height, r.n_pixels) == (15, 4, 60)
        assert r.sum_px == sum(px) and r.min_px == min(px) and r.max_px == max(px)

    def test_decode_audio_metadata(self, spark):
        from azure_data_engineering_spark.sources.multimodal import decode_audio_metadata

        samples = [(i * 7) % 300 - 150 for i in range(4000)]
        raw = struct.pack(f"<{len(samples)}h", *samples)
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1], "payload": [M.wav_encode(raw, 16000, channels=1)]})
        )
        r = decode_audio_metadata(df).collect()[0]
        assert (r.n_channels, r.sample_rate, r.n_frames) == (1, 16000, 4000)
        assert r.duration_ms == 250
        assert r.sum_amp == sum(samples)


class TestResizeImages:
    def test_nearest_neighbor_resample_roundtrip(self, spark):
        """Known 4x2 gradient fit into 2x2: scale=0.5, nearest picks
        src index (dst*src)//new — verify exact output pixels."""
        from azure_data_engineering_spark.sources.multimodal import resize_images

        px = bytes([0, 10, 20, 30, 100, 110, 120, 130])  # 4 wide, 2 tall
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1], "payload": [M.png_encode(px, 4, 2, channels=1)]})
        )
        r = resize_images(df, target_w=2, target_h=2).collect()[0]
        # scale = min(2/4, 2/2, 1) = 0.5 -> 2x1; ix = [0,2], iy = [0]
        assert (r.width, r.height, r.new_width, r.new_height) == (4, 2, 2, 1)
        assert r.out_sum == 0 + 20

    def test_upscale_is_clamped(self, spark):
        """Images already inside the box pass through (scale capped at
        1.0) — sum equals the source sum."""
        from azure_data_engineering_spark.sources.multimodal import resize_images

        px = bytes([5, 6, 7, 8])
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1], "payload": [M.png_encode(px, 2, 2, channels=1)]})
        )
        r = resize_images(df, target_w=32, target_h=32).collect()[0]
        assert (r.new_width, r.new_height) == (2, 2)
        assert r.out_sum == 26


class TestCodecProperties:
    """Property-based round-trips: ANY pixel/sample buffer survives
    encode->decode bit-exactly, for every filter type and channel
    count hypothesis picks."""

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        channels=st.integers(1, 4),
        filter_type=st.integers(0, 4),
        seed=st.integers(0, 2**31),
    )
    def test_png_roundtrip_property(self, w, h, channels, filter_type, seed):
        rng = random.Random(seed)
        px = bytes(rng.randrange(256) for _ in range(w * h * channels))
        W, H, C, out = M.png_decode(M.png_encode(px, w, h, channels, filter_type))
        assert (W, H, C, bytes(out)) == (w, h, channels, px)

    @settings(max_examples=40, deadline=None)
    @given(
        n=st.integers(1, 500),
        rate=st.sampled_from([8000, 16000, 44100]),
        channels=st.integers(1, 2),
        seed=st.integers(0, 2**31),
    )
    def test_wav_roundtrip_property(self, n, rate, channels, seed):
        rng = random.Random(seed)
        raw = struct.pack(
            f"<{n * channels}h",
            *[rng.randrange(-32768, 32768) for _ in range(n * channels)],
        )
        ch, r, frames, width, data = M.wav_decode(M.wav_encode(raw, rate, channels))
        assert (ch, r, frames, width, data) == (channels, rate, n, 2, raw)


class TestBinaryFileSource:
    def test_binaryfile_scan_feeds_the_decoder(self, spark, tmp_path):
        """The production path end-to-end: a directory of real .png
        files read through Spark's binaryFile source (path + content
        columns on executors) straight into the codec kernels — no
        synthetic payload column."""
        from pyspark.sql import functions as F

        from azure_data_engineering_spark.sources.multimodal import (
            decode_image_metadata,
            image_pixel_stats,
        )

        d = tmp_path / "imgs"
        d.mkdir()
        expect = {}
        for i in range(1, 6):
            w, h = 3 + i, 2 + i
            px = bytes((i * 11 + k) % 256 for k in range(w * h))
            (d / f"img_{i}.png").write_bytes(M.png_encode(px, w, h, filter_type=i % 5))
            expect[i] = (w, h, sum(px))

        raw = spark.read.format("binaryFile").load(str(d))
        payloads = raw.select(
            F.regexp_extract(F.col("path"), r"img_(\d+)\.png", 1).cast("long").alias("id"),
            F.col("content").alias("payload"),
        )
        meta = {r.id: (r.format, r.width, r.height) for r in decode_image_metadata(payloads).collect()}
        stats = {r.id: (r.width, r.height, r.sum_px) for r in image_pixel_stats(payloads).collect()}
        for i, (w, h, s) in expect.items():
            assert meta[i] == ("png", w, h)
            assert stats[i] == (w, h, s)


class TestAudioFrameSampling:
    def test_every_nth_frame_first_channel(self, spark):
        from azure_data_engineering_spark.sources.multimodal import sample_audio_frames

        # stereo: frames interleave L,R — sampling must stride by
        # every_n FRAMES and keep channel 0
        samples = []
        for f in range(10):
            samples += [f * 10, -(f * 10 + 1)]  # L=f*10, R=-(f*10+1)
        raw = struct.pack(f"<{len(samples)}h", *samples)
        df = spark.createDataFrame(
            pd.DataFrame({"id": [1], "payload": [M.wav_encode(raw, 8000, channels=2)]})
        )
        rows = sorted(
            (r.frame_no, r.sample_value)
            for r in sample_audio_frames(df, every_n=4).collect()
        )
        assert rows == [(0, 0), (1, 40), (2, 80)]  # frames 0,4,8 left channel


class TestJpegMetadata:
    """Marker-walk JPEG metadata (media_codecs.jpeg_metadata): ITU-T
    T.81 §B segment structure + EXIF IFD0 orientation + truncation
    detection, with zero entropy decoding."""

    def test_round_trip_matrix(self):
        for w, h, c, prog, ori, tr in [
            (640, 480, 3, False, 0, False),
            (1, 1, 1, False, 1, False),
            (65535, 65535, 3, True, 8, False),
            (31, 23, 2, True, 6, True),
        ]:
            b = M.jpeg_container(w, h, c, progressive=prog, orientation=ori, truncate=tr)
            assert M.sniff(b) == "jpeg"
            assert M.jpeg_metadata(b) == (w, h, c, prog, ori, tr)

    def test_not_a_jpeg_raises(self):
        import pytest

        with pytest.raises(ValueError, match="SOI"):
            M.jpeg_metadata(b"hello")

    def test_header_truncation_detected(self):
        full = M.jpeg_container(100, 50, 3)
        # cut inside the APP0 segment: no SOF ever seen, flagged
        assert M.jpeg_metadata(full[:10]) == (0, 0, 0, False, 0, True)
        # cut right after SOF but before EOI: dims survive, truncated
        w, h, c, prog, ori, tr = M.jpeg_metadata(full[: len(full) - 4])
        assert (w, h, c, tr) == (100, 50, 3, True)

    def test_garbage_between_segments_is_truncated_not_crash(self):
        assert M.jpeg_metadata(b"\xff\xd8zzzz")[5] is True

    def test_big_endian_exif(self):
        # hand-build an MM (Motorola) EXIF block; container builder
        # emits II, so this covers the other byte order
        tiff = (
            b"MM" + struct.pack(">HI", 42, 8)
            + struct.pack(">H", 1)
            + struct.pack(">HHI", 0x0112, 3, 1) + struct.pack(">HH", 5, 0)
            + struct.pack(">I", 0)
        )
        assert M._exif_orientation(b"Exif\x00\x00" + tiff) == 5

    def test_segment_length_overrun_is_truncated(self):
        # SOI + APP0 claiming 1000 bytes but buffer ends
        b = b"\xff\xd8\xff\xe0" + struct.pack(">H", 1000) + b"JFIF\x00"
        assert M.jpeg_metadata(b)[5] is True

    def test_restart_markers_in_entropy_stream(self):
        # RST0-7 inside entropy data must not terminate the scan
        base = M.jpeg_container(16, 16, 1, entropy_bytes=4)
        # splice an RST2 marker into the entropy data (before EOI)
        b = base[:-2] + b"\xff\xd2" + b"\x11\x22" + base[-2:]
        assert M.jpeg_metadata(b) == (16, 16, 1, False, 0, False)


class TestMixedImageMetadata:
    def test_mixed_png_jpeg_corrupt_triage(self, spark):
        from azure_data_engineering_spark.sources.multimodal import (
            image_metadata_full,
        )

        rows = [
            (1, M.png_encode(bytes(range(12)), 4, 3, channels=1)),
            (2, M.jpeg_container(640, 480, 3, orientation=6)),
            (3, M.jpeg_container(9, 9, 1, progressive=True, truncate=True)),
            (4, b"plain text junk"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "payload"]))
        got = {
            r.id: (r.format, r.width, r.height, r.components, r.progressive,
                   r.orientation, r.truncated)
            for r in image_metadata_full(df).collect()
        }
        assert got[1] == ("png", 4, 3, 1, 0, 0, 0)
        assert got[2] == ("jpeg", 640, 480, 3, 0, 6, 0)
        assert got[3] == ("jpeg", 9, 9, 1, 1, 0, 1)
        assert got[4] == ("corrupt", 0, 0, 0, 0, 0, 1)


class TestMp3Metadata:
    def test_header_walk_cbr(self):
        b = M.mp3_container(128, 44100, channels=2, n_frames=5, id3_size=0)
        ver, layer, kbps, rate, ch, n, dur, trunc = M.mp3_metadata(b)
        assert (ver, layer, kbps, rate, ch, n, trunc) == ("1", 3, 128, 44100, 2, 5, False)
        assert dur == 5 * 1152 * 1000 // 44100

    def test_id3v2_syncsafe_skip(self):
        # 200 > 127 forces the syncsafe 7-bit split across two bytes
        b = M.mp3_container(96, 32000, channels=1, n_frames=3, id3_size=200)
        assert b[:3] == b"ID3"
        ver, layer, kbps, rate, ch, n, dur, trunc = M.mp3_metadata(b)
        assert (kbps, rate, ch, n, trunc) == (96, 32000, 1, 3, False)

    def test_truncated_last_frame(self):
        b = M.mp3_container(160, 48000, n_frames=4, truncate=True)
        ver, layer, kbps, rate, ch, n, dur, trunc = M.mp3_metadata(b)
        assert n == 3 and trunc is True

    def test_id3_tag_overrun_is_truncated_not_error(self):
        b = b"ID3\x04\x00\x00" + bytes([0, 0, 7, 0x7F])  # declares ~1023B, absent
        ver, layer, kbps, rate, ch, n, dur, trunc = M.mp3_metadata(b)
        assert trunc is True and n == 0

    def test_not_mp3_raises(self):
        import pytest

        with pytest.raises(ValueError):
            M.mp3_metadata(b"random junk bytes")

    def test_mono_flag(self):
        b = M.mp3_container(64, 44100, channels=1, n_frames=2)
        assert M.mp3_metadata(b)[4] == 1


class TestFlacStreaminfo:
    def test_streaminfo_unpack(self):
        b = M.flac_container(44100, 2, 16, 987654)
        rate, ch, bps, total, minb, maxb, trunc = M.flac_streaminfo(b)
        assert (rate, ch, bps, total, minb, maxb, trunc) == (
            44100, 2, 16, 987654, 4096, 4096, False)

    def test_block_overrun_truncated(self):
        b = M.flac_container(8000, 1, 24, 500, truncate=True)
        rate, ch, bps, total, _minb, _maxb, trunc = M.flac_streaminfo(b)
        # STREAMINFO itself still parses; the padding block is cut
        assert (rate, ch, bps, total, trunc) == (8000, 1, 24, 500, True)

    def test_wide_fields(self):
        # 36-bit total_samples and 20-bit rate boundaries
        b = M.flac_container(655350, 8, 32, (1 << 36) - 1)
        rate, ch, bps, total, *_ = M.flac_streaminfo(b)
        assert (rate, ch, bps, total) == (655350, 8, 32, (1 << 36) - 1)

    def test_not_flac_raises(self):
        import pytest

        with pytest.raises(ValueError):
            M.flac_streaminfo(b"OggS not flac")


class TestMixedAudioMetadata:
    def test_mixed_wav_mp3_flac_corrupt_triage(self, spark):
        from azure_data_engineering_spark.sources.multimodal import (
            audio_metadata_full,
        )

        rows = [
            (1, M.wav_encode(bytes(2 * 80), 8000, channels=1)),
            (2, M.mp3_container(128, 44100, channels=2, n_frames=4, id3_size=40)),
            (3, M.mp3_container(96, 32000, channels=1, n_frames=3, truncate=True)),
            (4, M.flac_container(16000, 2, 24, 32000)),
            (5, b"plain text junk"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "payload"]))
        got = {
            r.id: (r.format, r.sample_rate, r.channels, r.bit_depth,
                   r.bitrate_kbps, r.n_frames, r.duration_ms, r.truncated)
            for r in audio_metadata_full(df).collect()
        }
        assert got[1] == ("wav", 8000, 1, 16, 128, 80, 10, 0)
        assert got[2] == ("mp3", 44100, 2, 0, 128, 4, 4 * 1152 * 1000 // 44100, 0)
        assert got[3] == ("mp3", 32000, 1, 0, 96, 2, 2 * 1152 * 1000 // 32000, 1)
        assert got[4] == ("flac", 16000, 2, 24, 0, 32000, 2000, 0)
        assert got[5] == ("corrupt", 0, 0, 0, 0, 0, 0, 1)


class TestMp4Metadata:
    def test_box_walk_full_container(self):
        b = M.mp4_container(
            brand="mp42", timescale=600, duration=3000,
            video=(1280, 720, "hvc1"), audio=True,
        )
        assert M.sniff(b) == "mp4"
        assert M.mp4_metadata(b) == (
            "mp42", 600, 5000, 2, 1, 1, 1280, 720, "hvc1", False,
        )

    def test_duration_integer_floor(self):
        b = M.mp4_container(timescale=90000, duration=123457, video=(640, 480, "avc1"))
        meta = M.mp4_metadata(b)
        assert meta[2] == 123457 * 1000 // 90000  # 1371, floored

    def test_audio_only_no_video_track(self):
        b = M.mp4_container(video=None, audio=True)
        brand, _ts, _d, n_tracks, has_v, has_a, w, h, codec, trunc = M.mp4_metadata(b)
        assert (n_tracks, has_v, has_a, w, h, codec, trunc) == (1, 0, 1, 0, 0, "", False)

    def test_mdat_overrun_is_truncated_not_crash(self):
        b = M.mp4_container(truncate=True)
        meta = M.mp4_metadata(b)
        assert meta[9] is True
        # moov precedes mdat, so the metadata itself still parses
        assert meta[0] == "isom" and meta[6] == 640

    def test_largesize_box(self):
        import struct
        # hand-craft a 64-bit-size ftyp followed by a v1 mvhd inside moov
        ftyp_body = b"isom" + bytes(4)
        ftyp = struct.pack(">I", 1) + b"ftyp" + struct.pack(">Q", 16 + len(ftyp_body)) + ftyp_body
        mvhd_v1 = b"\x01" + bytes(3) + bytes(16) + struct.pack(">IQ", 1000, 7500) + bytes(80)
        moov = M._mp4_box(b"moov", M._mp4_box(b"mvhd", mvhd_v1))
        meta = M.mp4_metadata(bytes(ftyp) + moov)
        assert meta[1] == 1000 and meta[2] == 7500 and meta[9] is False

    def test_not_mp4_raises(self):
        with pytest.raises(ValueError):
            M.mp4_metadata(b"RIFFxxxxWAVEfmt ")
        with pytest.raises(ValueError):
            M.mp4_metadata(b"short")

    def test_garbage_declared_size_truncated(self):
        import struct
        good = M.mp4_container()
        # a trailing box that declares 1 MB but provides 4 bytes
        bad = good + struct.pack(">I", 1 << 20) + b"free" + bytes(4)
        assert M.mp4_metadata(bad)[9] is True


class TestMixedVideoMetadata:
    def test_mixed_mp4_corrupt_triage(self, spark):
        from azure_data_engineering_spark.sources.multimodal import (
            video_metadata_full,
        )

        rows = [
            (1, M.mp4_container(brand="dash", timescale=1000, duration=42000,
                                video=(1920, 1080, "vp09"), audio=True)),
            (2, M.mp4_container(video=None, audio=True)),
            (3, M.mp4_container(truncate=True)),
            (4, b"plain text junk"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "payload"]))
        got = {
            r.id: (r.format, r.brand, r.duration_ms, r.n_tracks, r.has_video,
                   r.has_audio, r.width, r.height, r.video_codec, r.truncated)
            for r in video_metadata_full(df).collect()
        }
        assert got[1] == ("mp4", "dash", 42000, 2, 1, 1, 1920, 1080, "vp09", 0)
        assert got[2] == ("mp4", "isom", 5000, 1, 0, 1, 0, 0, "", 0)
        assert got[3][9] == 1
        assert got[4] == ("corrupt", "", 0, 0, 0, 0, 0, 0, "", 1)


class TestPdfMetadata:
    def test_full_featured(self):
        b = M.pdf_container(n_pages=3, with_text=True, with_image=True,
                            producer="unit (v1.2)")
        assert M.pdf_metadata(b) == ("1.7", 3, 1, 1, 0, "unit (v1.2)", False)

    def test_scanned_image_only_no_text_layer(self):
        b = M.pdf_container(n_pages=2, with_text=False, with_image=True)
        ver, n, has_text, has_img, enc, _p, trunc = M.pdf_metadata(b)
        assert (n, has_text, has_img, enc, trunc) == (2, 0, 1, 0, False)

    def test_encrypted_flag(self):
        assert M.pdf_metadata(M.pdf_container(encrypted=True))[4] == 1

    def test_truncated_download(self):
        b = M.pdf_container(truncate=True)
        assert M.pdf_metadata(b)[6] is True

    def test_startxref_past_end_is_truncated(self):
        b = M.pdf_container()
        # rewrite startxref to point beyond the buffer
        import re
        bad = re.sub(rb"startxref\n\d+", b"startxref\n99999999", b)
        assert M.pdf_metadata(bad)[6] is True

    def test_pages_not_confused_with_page_tree(self):
        # /Type /Pages (the tree node) must not count as a page
        assert M.pdf_metadata(M.pdf_container(n_pages=1))[1] == 1

    def test_escaped_producer_parens(self):
        b = M.pdf_container(producer="a (b) c")
        assert M.pdf_metadata(b)[5] == "a (b) c"

    def test_not_pdf_raises(self):
        with pytest.raises(ValueError):
            M.pdf_metadata(b"hello world this is not a pdf")


class TestMixedPdfMetadata:
    def test_mixed_pdf_corrupt_triage(self, spark):
        from azure_data_engineering_spark.sources.multimodal import (
            pdf_metadata_full,
        )

        rows = [
            (1, M.pdf_container(n_pages=4, with_text=True, producer="latex")),
            (2, M.pdf_container(with_text=False, with_image=True)),
            (3, M.pdf_container(encrypted=True)),
            (4, M.pdf_container(truncate=True)),
            (5, b"junk bytes"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "payload"]))
        got = {
            r.id: (r.format, r.n_pages, r.has_text, r.has_images,
                   r.encrypted, r.producer, r.truncated)
            for r in pdf_metadata_full(df).collect()
        }
        assert got[1] == ("pdf", 4, 1, 0, 0, "latex", 0)
        assert got[2] == ("pdf", 1, 0, 1, 0, "engine", 0)
        assert got[3][4] == 1
        assert got[4][6] == 1
        assert got[5] == ("corrupt", 0, 0, 0, 0, "", 1)


class TestMkvMetadata:
    def test_full_container(self):
        b = M.mkv_container(doctype="webm", duration_ms=42000,
                            video=(1920, 1080, "V_VP9"), audio=True)
        assert M.sniff(b) == "mkv"
        assert M.mkv_metadata(b) == (
            "webm", 42000, 2, 1, 1, 1920, 1080, "V_VP9", False,
        )

    def test_audio_only(self):
        b = M.mkv_container(video=None, audio=True)
        doctype, dur, n_tracks, has_v, has_a, w, h, codec, trunc = M.mkv_metadata(b)
        assert (n_tracks, has_v, has_a, w, h, codec) == (1, 0, 1, 0, 0, "")

    def test_truncated_cluster_flagged_metadata_intact(self):
        b = M.mkv_container(truncate=True)
        meta = M.mkv_metadata(b)
        assert meta[8] is True
        assert meta[0] == "matroska" and meta[5] == 640

    def test_nondefault_timescale(self):
        # 100us units: duration field carries duration_ms*10 units
        b = M.mkv_container(timescale=100000, duration_ms=7000)
        assert M.mkv_metadata(b)[1] == 7000

    def test_unknown_size_vint(self):
        # a size varint of all ones means unknown-size
        assert M._ebml_vint(b"\xff", 0, keep_marker=False)[0] == -1
        assert M._ebml_vint(b"\x01\xff\xff\xff\xff\xff\xff\xff", 0,
                            keep_marker=False)[0] == -1

    def test_not_ebml_raises(self):
        with pytest.raises(ValueError):
            M.mkv_metadata(b"RIFF....WEBP")

    def test_mixed_kernel_routes_both_containers(self, spark):
        from azure_data_engineering_spark.sources.multimodal import (
            video_metadata_full,
        )

        rows = [
            (1, M.mp4_container(brand="isom", video=(640, 480, "avc1"))),
            (2, M.mkv_container(doctype="webm", duration_ms=9000,
                                video=(854, 480, "V_AV1"))),
            (3, b"garbage"),
        ]
        df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "payload"]))
        got = {r.id: (r.format, r.brand, r.video_codec)
               for r in video_metadata_full(df).collect()}
        assert got[1] == ("mp4", "isom", "avc1")
        assert got[2] == ("mkv", "webm", "V_AV1")
        assert got[3][0] == "corrupt"
