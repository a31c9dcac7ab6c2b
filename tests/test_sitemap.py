"""Sitemap parsing tests (operators/sitemap): protocol semantics —
loc required, priority default/clamp, cross-host flagging, index vs
urlset vs invalid — and the codegen-only plan contract."""

from __future__ import annotations

from azure_data_engineering_spark.operators.sitemap import sitemap_entries


def _parse(spark, xml, url="https://site0.example.com/sitemap.xml"):
    df = spark.createDataFrame(
        [(1, xml, url)], "id long, xml string, url string"
    )
    return sitemap_entries(df, "xml", "url", "id").collect()


class TestSitemapEntries:
    def test_urlset_fields(self, spark):
        rows = _parse(
            spark,
            "<urlset>"
            "<url><loc>https://site0.example.com/a</loc>"
            "<lastmod>2024-01-01</lastmod><changefreq>daily</changefreq>"
            "<priority>0.8</priority></url>"
            "<url><loc> https://site0.example.com/b </loc></url>"
            "</urlset>",
        )
        assert len(rows) == 2
        a, b = rows
        assert (a.kind, a.entry_idx, a.loc) == (
            "urlset", 0, "https://site0.example.com/a"
        )
        assert a.lastmod == "2024-01-01" and a.changefreq == "daily"
        assert a.priority == 0.8 and a.cross_host == 0
        # loc whitespace trimmed; absent fields -> NULL / spec default
        assert b.loc == "https://site0.example.com/b"
        assert b.lastmod is None and b.changefreq is None
        assert b.priority == 0.5

    def test_priority_unparseable_and_clamped(self, spark):
        rows = _parse(
            spark,
            "<urlset>"
            "<url><loc>https://site0.example.com/a</loc>"
            "<priority>high</priority></url>"
            "<url><loc>https://site0.example.com/b</loc>"
            "<priority>7.5</priority></url>"
            "</urlset>",
        )
        assert rows[0].priority == 0.5  # spec default on junk
        assert rows[1].priority == 1.0  # clamped

    def test_cross_host_flagged(self, spark):
        rows = _parse(
            spark,
            "<urlset><url><loc>https://evil.example.net/x</loc></url></urlset>",
        )
        assert rows[0].cross_host == 1

    def test_loc_required(self, spark):
        rows = _parse(
            spark,
            "<urlset><url><lastmod>2024-01-01</lastmod></url>"
            "<url><loc>https://site0.example.com/ok</loc></url></urlset>",
        )
        assert len(rows) == 1 and rows[0].loc.endswith("/ok")

    def test_sitemapindex(self, spark):
        rows = _parse(
            spark,
            "<sitemapindex><sitemap>"
            "<loc>https://site0.example.com/s1.xml.gz</loc>"
            "<lastmod>2024-02-02</lastmod></sitemap></sitemapindex>",
        )
        assert rows[0].kind == "index" and rows[0].lastmod == "2024-02-02"
        assert rows[0].priority is None and rows[0].changefreq is None

    def test_invalid_quarantines(self, spark):
        rows = _parse(spark, "<html>nope</html>")
        assert len(rows) == 1
        assert rows[0].kind == "invalid" and rows[0].entry_idx == -1
        assert rows[0].loc is None

    def test_plan_is_codegen_only(self, spark, sf_dir):
        import __spark_entry__ as entrymod
        from azure_data_engineering_spark.plans.inspect import formatted_plan

        plan = formatted_plan(entrymod.q_sitemap_parse(spark, sf_dir))
        assert "Exchange" not in plan
        for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
            assert py not in plan
