"""Golden ETL behavior tests — the reference's observable semantics
encoded as fixtures (SURVEY.md §5 item 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from azure_data_engineering_spark.functions.sanitize import sanitize_cell, sanitize_filename
from azure_data_engineering_spark.functions.datetime_utils import retention_match, archive_folder
from azure_data_engineering_spark.functions.text import (
    whitespace_token_count,
    bpe_ish_token_count,
    doc_fingerprint,
    detect_lang,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


class TestSanitize:
    """Char-level expectations from HelperFunction.py:36-41."""

    def test_exact_chain(self, spark):
        # commas/quotes deleted; newline and backslash -> space;
        # slash -> dash; non-ascii stripped
        raw = "a,b'c\nd\\e/fég"
        assert _one(spark, sanitize_cell(F.lit(raw))) == "abc d e-fg"

    def test_idempotent(self, spark):
        raw = "x,y/z'\n\\ 中"
        once = _one(spark, sanitize_cell(F.lit(raw)))
        twice = _one(spark, sanitize_cell(sanitize_cell(F.lit(raw))))
        assert once == twice

    def test_filename(self, spark):
        # re.sub('[^A-Za-z0-9]+','') — HelperFunction.py:18-19
        assert _one(spark, sanitize_filename(F.lit("My Book-2024 (v2).xlsx"))) == "MyBook2024v2xlsx"


class TestRetention:
    """Window edges from HelperFunction.py:99-106: stamp must lie in
    [ref+daydiff-60 @000000, ref+daydiff @999999]."""

    def _match(self, spark, name):
        ref = F.lit("2024-03-01").cast("date")  # built lazily: needs an active session
        return _one(
            spark,
            retention_match(F.lit(name), "-ls-", "myfactory", ref, daydiff=-5, window_days=60),
        )

    def test_inside_window(self, spark):
        assert self._match(spark, "adfmyfactory-ls-20240101120000") is True

    def test_upper_edge_inclusive(self, spark):
        # ref-5d = 2024-02-25 -> bound 20240225999999 includes any time that day
        assert self._match(spark, "adfmyfactory-ls-20240225235959") is True

    def test_above_window(self, spark):
        assert self._match(spark, "adfmyfactory-ls-20240226000000") in (False, None)

    def test_lower_edge_inclusive(self, spark):
        # ref-65d = 2023-12-27 -> bound 20231227000000
        assert self._match(spark, "adfmyfactory-ls-20231227000000") is True

    def test_below_window(self, spark):
        assert self._match(spark, "adfmyfactory-ls-20231226235959") in (False, None)

    def test_foreign_container_filtered_not_error(self, spark):
        # the reference's implicit-None fallthrough (HelperFunction.py:95)
        assert not self._match(spark, "adfOTHER-xx-20240101120000")

    def test_no_stamp(self, spark):
        assert not self._match(spark, "adfmyfactory-ls-nodigits")

    def test_archive_naming(self, spark):
        # {folder}_{yyyyMMddHHmm} — HelperFunction.py:52-55
        out = _one(
            spark,
            archive_folder(F.lit("input"), F.lit("2024-03-01 12:34:56").cast("timestamp")),
        )
        assert out == "input_202403011234"


class TestTextFunctions:
    def test_token_counts_empty(self, spark):
        assert _one(spark, whitespace_token_count(F.lit(""))) == 0
        assert _one(spark, whitespace_token_count(F.lit("   "))) == 0
        assert _one(spark, whitespace_token_count(F.lit("a  b\tc"))) == 3

    def test_bpe_ish(self, spark):
        # "don't stop2x!" -> don | ' | t | stop | 2 | x | !
        assert _one(spark, bpe_ish_token_count(F.lit("don't stop2x!"))) == 7

    def test_fingerprint_normalization(self, spark):
        a = _one(spark, doc_fingerprint(F.lit("Hello,  World!")))
        b = _one(spark, doc_fingerprint(F.lit("hello world")))
        assert a == b

    def test_detect_lang(self, spark):
        assert _one(spark, detect_lang(F.lit("the cat and the dog of a"))) == "en"
        assert _one(spark, detect_lang(F.lit("el perro y la casa que"))) == "es"
        assert _one(spark, detect_lang(F.lit("zzz qqq"))) == "und"
        # tiebreak: 'de' before 'zh' alphabetically when scores equal
        assert _one(spark, detect_lang(F.lit("und wo shi"))) in ("de", "zh")


class TestHtmlAndUnicode:
    def test_strip_html_drops_subtrees_and_unescapes_last(self, spark):
        from azure_data_engineering_spark.functions.text import strip_html
        from pyspark.sql import functions as F

        html = (
            '<div class="x"><script>if (1 < 2) alert("hi");</script>'
            "<style>a { b: c; }</style><p>Hello  <b>world</b></p>"
            " &lt;tag&gt; &amp; &quot;q&quot;</div>"
        )
        df = spark.createDataFrame([(html,)], ["h"])
        out = df.select(strip_html(F.col("h")).alias("t")).collect()[0].t
        # entities unescape AFTER tag stripping: '<tag>' survives as text
        assert out == 'Hello world <tag> & "q"'

    def test_strip_html_none_and_plain(self, spark):
        from azure_data_engineering_spark.functions.text import strip_html
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("no tags here",), (None,)], ["h"])
        rows = df.select(strip_html(F.col("h")).alias("t")).collect()
        assert rows[0].t == "no tags here" and rows[1].t is None

    def test_normalize_nfc_composes_and_is_idempotent(self, spark):
        import unicodedata

        from azure_data_engineering_spark.functions.text import normalize_nfc
        from pyspark.sql import functions as F

        decomposed = "café naïve"
        composed = unicodedata.normalize("NFC", decomposed)
        assert decomposed != composed  # the fixture genuinely decomposes
        df = spark.createDataFrame([(decomposed,), (composed,), (None,)], ["s"])
        rows = df.select(normalize_nfc(F.col("s")).alias("n")).collect()
        assert rows[0].n == composed
        assert rows[1].n == composed  # idempotent
        assert rows[2].n is None
