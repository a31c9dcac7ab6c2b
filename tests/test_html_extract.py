"""Main-content extraction tests (operators/html_extract): chrome
removal, byte-identical body survival, absorption, link density,
degenerate pages, and the codegen-only plan contract."""

from __future__ import annotations

from azure_data_engineering_spark.operators.html_extract import main_content

PAGE = (
    "<html><head><title>x</title><script>var a = 1;</script></head><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    "<h1>Title p7</h1>"
    "<p>one two three four five six seven eight nine ten</p>"
    '<aside><ul><li><a href="#">Archive</a></li><li><a href="#">Tags</a></li></ul></aside>'
    "<p>alpha beta gamma delta epsilon zeta</p>"
    "<p>brief interlude note here</p>"
    "<p>red green blue yellow purple orange</p>"
    '<footer>(c) 2024 <a href="#">privacy</a> <a href="#">terms</a>'
    ' <a href="#">imprint</a></footer>'
    "</body></html>"
)


def _extract(spark, html):
    df = spark.createDataFrame([(1, html)], "id long, html string")
    return main_content(df, "html").collect()[0]


class TestMainContent:
    def test_chrome_dropped_body_survives_byte_identically(self, spark):
        r = _extract(spark, PAGE)
        assert r.main_text == (
            "one two three four five six seven eight nine ten\n"
            "alpha beta gamma delta epsilon zeta\n"
            "brief interlude note here\n"
            "red green blue yellow purple orange"
        )
        for chrome in ("Home", "Title", "Archive", "privacy", "2024", "var a"):
            assert chrome not in r.main_text
        assert r.n_content_blocks == 4

    def test_absorption_requires_both_neighbors(self, spark):
        # interlude at the END (next neighbor is the bad footer): dropped
        page = (
            "<body><p>one two three four five six</p>"
            "<p>brief interlude note here</p>"
            "<footer>(c) <a href='#'>privacy</a> <a href='#'>terms</a>"
            " <a href='#'>imprint</a></footer></body>"
        )
        r = _extract(spark, page)
        assert r.main_text == "one two three four five six"

    def test_link_dense_long_block_dropped(self, spark):
        # >= 5 words but nearly all anchor text: link density kills it
        page = (
            "<body><p>one two three four five six</p>"
            '<div><a href="/p">alpha beta gamma</a> <a href="/q">delta'
            " epsilon zeta</a> ok</div></body>"
        )
        r = _extract(spark, page)
        assert r.main_text == "one two three four five six"

    def test_inline_markup_and_entities_unescape(self, spark):
        page = "<body><p>one <b>two</b> three &amp; four five&nbsp;six</p></body>"
        r = _extract(spark, page)
        assert r.main_text == "one two three & four five six"

    def test_empty_and_chrome_only_pages(self, spark):
        assert _extract(spark, "").main_text == ""
        r = _extract(spark, "<body><nav><a href='/'>Home</a></nav></body>")
        assert r.main_text == "" and r.n_content_blocks == 0
        assert r.n_blocks == 1

    def test_thresholds_configurable(self, spark):
        df = spark.createDataFrame(
            [(1, "<body><p>one two three</p></body>")], "id long, html string"
        )
        strict = main_content(df, "html").collect()[0]
        loose = main_content(df, "html", min_words=3).collect()[0]
        assert strict.main_text == "" and loose.main_text == "one two three"

    def test_plan_is_codegen_only(self, spark, sf_dir):
        """In-row HOFs: scan → project. No shuffle, no Python worker."""
        import __spark_entry__ as entrymod
        from azure_data_engineering_spark.plans.inspect import formatted_plan

        plan = formatted_plan(entrymod.q_main_content(spark, sf_dir))
        assert "Exchange" not in plan
        for py in ("MapInPandas", "ArrowEvalPython", "BatchEvalPython"):
            assert py not in plan
