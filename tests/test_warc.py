"""WARC source tests (sources/warc): record walk on both layouts,
truncation semantics, quarantine, HTTP split, file-based read, and the
partition-parallel plan contract."""

from __future__ import annotations

import hashlib

import pytest

from azure_data_engineering_spark.sources.warc import (
    _page_body,
    _status_for,
    parse_warc,
    read_warc,
    warc_container,
    warc_records,
)


class TestParseWarc:
    @pytest.mark.parametrize("gz", [True, False])
    def test_record_walk_both_layouts(self, gz):
        recs, trunc = parse_warc(warc_container(11, 3, gzip_members=gz))
        assert not trunc and len(recs) == 7
        assert recs[0]["rec_type"] == "warcinfo"
        assert recs[0]["mime"] == "application/warc-fields"
        for j in range(3):
            req, resp = recs[1 + 2 * j], recs[2 + 2 * j]
            assert req["rec_type"] == "request"
            assert req["http_status"] == 0
            assert req["mime"] == "application/http"
            assert resp["rec_type"] == "response"
            assert resp["http_status"] == _status_for(11, j)[0]
            assert resp["mime"] == "text/html"
            assert resp["body"].decode() == _page_body(11, j)
            assert resp["target_uri"] == f"https://site11.example.com/page/{j}"

    @pytest.mark.parametrize("gz", [True, False])
    def test_tail_cut_drops_exactly_last_record(self, gz):
        recs, trunc = parse_warc(
            warc_container(11, 3, gzip_members=gz, truncate=True)
        )
        assert trunc and len(recs) == 6  # warcinfo + 3 req + 2 resp
        assert recs[-1]["rec_type"] == "request"

    def test_mid_stream_corrupt_member_stops_walk(self):
        # overwrite the SECOND gzip member's magic: records before it
        # survive, the walk stops, truncated flags
        full = warc_container(5, 2, gzip_members=True)
        second = full.find(b"\x1f\x8b", 2)
        corrupted = full[:second] + b"XX" + full[second + 2 :]
        recs, trunc = parse_warc(corrupted)
        assert trunc and len(recs) == 1  # only warcinfo survives
        # flipping bytes INSIDE the member (bad CRC) also stops cleanly
        inner = full[:second + 20] + b"ZZ" + full[second + 22 :]
        recs2, trunc2 = parse_warc(inner)
        assert trunc2 and len(recs2) == 1

    def test_non_warc_raises(self):
        with pytest.raises(ValueError, match="not a WARC"):
            parse_warc(b"PK\x03\x04 not a warc")

    def test_http_status_variants(self):
        # k % 9 == 0 -> 301 beats k % 5 == 0 -> 404 beats 200
        assert _status_for(45, 0)[0] == 301   # 45 % 9 == 0 (and % 5)
        assert _status_for(5, 0)[0] == 404
        assert _status_for(1, 0)[0] == 200


class TestWarcRecordsSpark:
    def _files(self, spark, specs):
        import pandas as pd

        rows = [
            (i, warc_container(i, n, gzip_members=gz, truncate=tr))
            for (i, n, gz, tr) in specs
        ]
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["id", "payload"]),
            "id bigint, payload binary",
        )

    def test_body_md5_matches_generating_text(self, spark):
        df = self._files(spark, [(7, 2, True, False)])
        out = {r.rec_idx: r for r in warc_records(df).collect()}
        assert len(out) == 5
        body1 = _page_body(7, 1).encode()
        assert out[4].body_md5 == hashlib.md5(body1).hexdigest()
        assert out[4].body_len == len(body1)
        assert out[4].file_format == "warc.gz"

    def test_quarantine_row_for_junk(self, spark):
        import pandas as pd

        df = spark.createDataFrame(
            pd.DataFrame([(1, b"garbage")], columns=["id", "payload"]),
            "id bigint, payload binary",
        )
        rows = warc_records(df).collect()
        assert len(rows) == 1
        assert rows[0].malformed == 1 and rows[0].file_format == "corrupt"

    def test_extraction_plan_is_shuffle_free(self, spark, sf_dir):
        """The record explode must stay embarrassingly parallel:
        scan → mapInPandas, zero Exchange."""
        import __spark_entry__ as entrymod
        from azure_data_engineering_spark.plans.inspect import formatted_plan

        plan = formatted_plan(entrymod.q_warc_ingest(spark, sf_dir))
        assert "Exchange" not in plan
        assert "MapInPandas" in plan


class TestReadWarcFiles:
    def test_binary_file_round_trip(self, spark, tmp_path):
        for i in (3, 4):
            (tmp_path / f"f{i}.warc.gz").write_bytes(
                warc_container(i, 2, gzip_members=True)
            )
        out = read_warc(spark, str(tmp_path / "*.warc.gz"))
        rows = out.collect()
        assert len(rows) == 10 and all(r.path for r in rows)
        by_file = {}
        for r in rows:
            by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
        assert sorted(by_file) == ["f3.warc.gz", "f4.warc.gz"]
        assert all(len(v) == 5 for v in by_file.values())


class TestWarcResponseTexts:
    def test_response_bodies_decode(self, spark):
        import pandas as pd

        from azure_data_engineering_spark.sources.warc import (
            warc_response_texts,
        )

        df = spark.createDataFrame(
            pd.DataFrame(
                [(9, warc_container(9, 2, gzip_members=True)),
                 (2, b"junk")],
                columns=["id", "payload"],
            ),
            "id bigint, payload binary",
        )
        rows = warc_response_texts(df).collect()
        # junk file contributes nothing; 2 responses from file 9
        assert len(rows) == 2
        assert {r.rec_idx for r in rows} == {2, 4}
        assert all(r.mime == "text/html" for r in rows)
        assert rows[0].html.startswith("<html><head><title>p9-")

    def test_pipeline_query_matches_formula(self, spark, sf_dir):
        import __spark_entry__ as entrymod

        out = {r.host: r for r in
               entrymod.q_crawl_pipeline(spark, sf_dir).collect()}
        assert len(out) == 50
        # host site1: ids 1, 51, 101, 151, 201, 251 (none junk)
        r = out["site1.example.com"]
        total = r.n_ok + r.n_redirect + r.n_notfound
        # pages: sum over ids of n_pages minus truncation cuts
        ids = [1, 51, 101, 151, 201, 251]
        expect = sum(1 + i % 4 for i in ids) - sum(
            1 for i in ids if i % 10 == 7
        )
        assert total == expect


class TestWetExport:
    def test_roundtrip_and_deterministic_layout(self, spark):
        from azure_data_engineering_spark.sources.warc import (
            parse_warc,
            wet_write_bytes,
        )

        rows = [
            (1, "https://a.example.com/2", "beta text two"),
            (1, "https://a.example.com/10", "alpha text ten"),
            (2, "https://b.example.com/1", "gamma"),
        ]
        schema = "bucket long, uri string, txt string"
        outs = []
        for parts in (1, 5):
            df = spark.createDataFrame(rows, schema).repartition(parts)
            outs.append({
                r.id: bytes(r.payload)
                for r in wet_write_bytes(df, "bucket", "uri", "txt").collect()
            })
        # byte-identical files regardless of partitioning
        assert outs[0] == outs[1]
        recs, trunc = parse_warc(outs[0][1])
        assert not trunc
        assert [r["rec_type"] for r in recs] == [
            "warcinfo", "conversion", "conversion",
        ]
        # records ordered by URI string: '/10' < '/2'
        assert recs[1]["target_uri"].endswith("/10")
        assert recs[1]["body"] == b"alpha text ten"
        assert recs[1]["mime"] == "text/plain"


class TestRobotsSitemaps:
    def test_directive_extraction(self, spark):
        from azure_data_engineering_spark.operators.robots import (
            robots_sitemaps,
        )

        body = (
            "# header\nUser-agent: *\nDisallow: /x\n"
            "Sitemap: https://h.example.com/s1.xml\n"
            "sitemap: https://h.example.com/s2.xml # nightly\n"
            "SITEMAP: /relative.xml\n"
            "Crawl-delay: 5\n"
        )
        df = spark.createDataFrame([(1, body)], "id long, robots string")
        rows = sorted(
            robots_sitemaps(df, "id", "robots").collect(),
            key=lambda r: r.line_idx,
        )
        assert [r.sitemap_url for r in rows] == [
            "https://h.example.com/s1.xml",
            "https://h.example.com/s2.xml",
            "/relative.xml",
        ]
        assert [r.absolute for r in rows] == [1, 1, 0]
        assert [r.line_idx for r in rows] == [3, 4, 5]
