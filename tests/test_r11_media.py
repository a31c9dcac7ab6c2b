"""GIF and ZIP/OOXML triage tests (sources/media_codecs r11): builder
round-trips, truncation semantics, classification, quarantine."""

from __future__ import annotations

import pytest

from azure_data_engineering_spark.sources.media_codecs import (
    gif_container,
    gif_metadata,
    zip_container,
    zip_metadata,
)


class TestGifMetadata:
    def test_still_image(self):
        ver, w, h, nf, anim, loop, trunc = gif_metadata(
            gif_container("87a", 64, 48, 1)
        )
        assert (ver, w, h, nf) == ("87a", 64, 48, 1)
        assert anim == 0 and loop == -1 and not trunc

    def test_animated_with_netscape_loop(self):
        ver, w, h, nf, anim, loop, trunc = gif_metadata(
            gif_container("89a", 320, 200, 5, netscape_loop=3)
        )
        assert (ver, nf, anim, loop) == ("89a", 5, 1, 3)
        assert not trunc

    def test_multi_frame_without_netscape_still_animated(self):
        _, _, _, nf, anim, loop, _ = gif_metadata(gif_container("89a", 8, 8, 2))
        assert nf == 2 and anim == 1 and loop == -1

    def test_truncated_loses_last_frame(self):
        # the 10-byte tail cut removes the trailer and the last frame's
        # descriptor — the arithmetic the oracle replays
        _, _, _, nf, _, _, trunc = gif_metadata(
            gif_container("89a", 16, 16, 4, truncate=True)
        )
        assert trunc and nf == 3

    def test_netscape_buffering_variant_reports_unknown_loop(self):
        # A conforming NETSCAPE2.0 extension whose FIRST data sub-block
        # is the buffering variant (length 5, id 2) not the looping one
        # (length 3, id 1): has_netscape still marks it animated, but
        # loop_count must be -1 (unknown), never bytes read at a fixed
        # offset inside the wrong sub-block.
        import struct as _s

        out = bytearray()
        out += b"GIF89a" + _s.pack("<HH", 8, 8) + bytes([0x80 | 1, 0, 0])
        out += bytes(12)  # 4-color global table
        out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([5, 2]) + _s.pack("<I", 4096) + bytes([0])
        out += bytes([0x2C]) + _s.pack("<HHHH", 0, 0, 8, 8)
        out += bytes([0, 2, 4, 1, 7, 0x44, 0x01, 0])
        out += bytes([0x3B])
        ver, w, h, nf, anim, loop, trunc = gif_metadata(bytes(out))
        assert (ver, w, h, nf) == ("89a", 8, 8, 1)
        assert anim == 1 and loop == -1 and not trunc

    def test_non_gif_raises(self):
        with pytest.raises(ValueError, match="not a GIF"):
            gif_metadata(b"RIFF....WEBP")

    def test_large_global_color_table_skipped(self):
        payload = gif_container("89a", 10, 10, 1, gct_bits=7)  # 256 colors
        ver, w, h, nf, *_ = gif_metadata(payload)
        assert (w, h, nf) == (10, 10, 1)


class TestZipMetadata:
    def test_plain_zip(self):
        kind, ne, unc, comp, hct, trunc = zip_metadata(
            zip_container("zip", n_extra=3, seed=12)
        )
        assert kind == "zip" and ne == 3 and hct == 0 and not trunc
        # STORED: compressed == uncompressed == 3 * len('content 12 j')
        assert unc == comp == 3 * 12

    def test_ooxml_classification(self):
        for kind in ("docx", "xlsx", "pptx"):
            got = zip_metadata(zip_container(kind, n_extra=1, seed=7))
            assert got[0] == kind and got[4] == 1 and got[1] == 3

    def test_empty_archive(self):
        kind, ne, unc, comp, hct, trunc = zip_metadata(
            zip_container("zip", n_extra=0, seed=1)
        )
        assert ne == 0 and unc == 0 and not trunc

    def test_lost_eocd_is_truncated_not_error(self):
        got = zip_metadata(zip_container("docx", n_extra=2, seed=9, truncate=True))
        assert got == ("zip", 0, 0, 0, 0, True)

    def test_non_zip_raises(self):
        with pytest.raises(ValueError, match="not a ZIP"):
            zip_metadata(b"<!DOCTYPE html><html></html>")

    def test_stdlib_zipfile_reads_fixture_back(self):
        # cross-check the hand walk against the stdlib reader
        import io
        import zipfile

        raw = zip_container("xlsx", n_extra=2, seed=55)
        names = zipfile.ZipFile(io.BytesIO(raw)).namelist()
        kind, ne, unc, _, _, _ = zip_metadata(raw)
        assert ne == len(names)
        infos = zipfile.ZipFile(io.BytesIO(raw)).infolist()
        assert unc == sum(i.file_size for i in infos)
