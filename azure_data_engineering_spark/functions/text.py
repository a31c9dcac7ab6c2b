"""Text-analysis Column functions for the LLM-data-pipeline surface.

All JVM-side built-ins (no Python UDFs): at 100 TB these run inside
whole-stage codegen over the parquet scan, with only the projected
`text` column read (column pruning).

North-star ops from BASELINE.json: token counting, quality scoring,
language-ID heuristic, document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword profiles for the n-gram/stopword heuristic
# language scorer. Public knowledge (most-frequent function words).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "fr": ("le", "la", "de", "et", "les"),
    "de": ("der", "die", "das", "und", "zu"),
    "zh": ("de", "le", "shi", "bu", "wo"),
}


def whitespace_token_count(col: Column) -> Column:
    """Tokens by whitespace split; empty/blank text counts 0."""
    trimmed = F.trim(col)
    return F.when(trimmed == "", F.lit(0)).otherwise(F.size(F.split(trimmed, r"\s+")))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-ish regex token count: runs of letters, runs of digits, and
    single non-alphanumeric-non-space chars each count as one token."""
    return F.size(F.regexp_extract_all(F.lower(col), F.lit(r"([a-z]+|[0-9]+|[^a-z0-9\s])"), F.lit(1)))


def normalize_text(col: Column) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, strip
    non-alphanumerics to spaces, collapse whitespace, trim."""
    c = F.lower(col)
    c = F.regexp_replace(c, "[^a-z0-9]+", " ")
    return F.trim(c)


def doc_fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text.

    md5 (not murmur/xxhash) so fingerprints are portable across engines
    and stable across Spark versions — they may be persisted as dedup
    keys."""
    return F.md5(normalize_text(col))


def punct_ratio(col: Column) -> Column:
    """Quality signal: fraction of characters that are punctuation."""
    n = F.length(col)
    p = F.length(F.regexp_replace(col, "[^.,;:!?'\"()\\[\\]{}-]", ""))
    return F.when(n == 0, F.lit(0.0)).otherwise(p / n)


def stopword_ratio(col: Column, stopwords: tuple[str, ...] = LANG_PROFILES["en"]) -> Column:
    """Quality signal: fraction of whitespace tokens that are stopwords."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    hits = F.size(F.filter(toks, _isin_pred(stopwords)))
    total = F.size(toks)
    return F.when(total == 0, F.lit(0.0)).otherwise(hits / total)


def _isin_pred(words: tuple[str, ...]):
    # single-arity lambda factory: PySpark higher-order functions
    # require the lambda signature to match exactly (no default args)
    return lambda t: t.isin(*words)


def lang_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID heuristic).

    Returns a dict lang -> integer score column; argmax (with a fixed
    alphabetical tiebreak) is the detected language. Composable so the
    caller can build either a struct or a CASE ladder."""
    toks = F.split(F.lower(F.trim(col)), r"\s+")
    return {lang: F.size(F.filter(toks, _isin_pred(sw))) for lang, sw in LANG_PROFILES.items()}


def detect_lang(col: Column) -> Column:
    """Argmax of lang_scores with deterministic alphabetical tiebreak;
    'und' (undetermined) when every score is 0."""
    scores = lang_scores(col)
    langs = sorted(scores)  # alphabetical tiebreak: first max wins
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    # build CASE from last to first so earlier (alphabetical) langs win ties
    for lang in reversed(langs):
        out = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(out)
    return out


def strip_html(col: Column) -> Column:
    """HTML -> text for crawl preprocessing, entirely in codegen
    regexps (no parser dependency): drop script/style subtrees, strip
    tags, unescape the common entities LAST (so '&lt;b&gt;' in content
    survives as literal text, never re-parsed as a tag), collapse
    whitespace. Patterns avoid lookaround so Java regex (Spark) and
    RE2 (DuckDB oracle) agree byte-for-byte.

    Known regex-parser boundary (same as every regex HTML stripper):
    a literal '>' inside a quoted attribute value (<a title="a>b">)
    terminates the tag match early and leaks the remainder as text.
    Real crawls rarely emit that; a full parser belongs behind
    mapInPandas if a corpus needs it."""
    out = F.regexp_replace(col, r"(?is)<script[^>]*>.*?</script>", " ")
    out = F.regexp_replace(out, r"(?is)<style[^>]*>.*?</style>", " ")
    out = F.regexp_replace(out, r"(?s)<[^>]+>", " ")
    for ent, ch in (
        ("&nbsp;", " "),
        ("&amp;", "&"),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
    ):
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, r"\s+", " "))


def normalize_nfc(col: Column) -> Column:
    """Unicode NFC normalization (decomposed e+U+0301 -> é etc.) — an
    LLM-corpus must-have (mixed-form text double-counts vocabulary and
    dodges exact dedup). No JVM built-in exists, so this is the one
    sanctioned Python seam: an Arrow-batched pandas UDF over
    unicodedata.normalize — vectorized transfer, per-batch Python,
    ~identical cost to a string copy at corpus scale."""
    import pandas as pd  # noqa: F401 — needed at module-eval time for the UDF type hints
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        import unicodedata

        return s.map(lambda v: None if v is None else unicodedata.normalize("NFC", v))

    # annotate explicitly so pandas_udf's type-hint inference sees real
    # classes (string hints from a local import don't resolve)
    _nfc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_nfc, "string")(col)


def syllable_count(col: Column) -> Column:
    """Heuristic syllable count: the number of vowel GROUPS
    ([aeiouy]+ runs) in the lowercased text — the standard cheap
    approximation under readability formulas (each vowel cluster ≈
    one syllable nucleus). Pure regexp_count, RE2-safe, identical in
    any SQL oracle via len(regexp_extract_all(s, '[aeiouy]+'))."""
    return F.regexp_count(F.lower(col), F.lit("[aeiouy]+"))


def sentence_count(col: Column) -> Column:
    """Sentence count as terminal-punctuation runs ([.!?]+), floored
    at 1 so unpunctuated text counts as one sentence."""
    return F.greatest(F.regexp_count(col, F.lit("[.!?]+")), F.lit(1))


def flesch_reading_ease(col: Column) -> Column:
    """Flesch reading ease (Flesch 1948):

        206.835 - 1.015 * words/sentences - 84.6 * syllables/words

    from whitespace words, vowel-group syllables, and terminal-
    punctuation sentences — the classic text-difficulty prior used
    as a quality/audience signal in corpus curation (alongside the
    stopword/punct ratios in quality_score). All three counts are
    exact integers, so the formula is two IEEE divisions — identical
    on every engine."""
    words = whitespace_token_count(col)
    return (
        F.lit(206.835)
        - F.lit(1.015) * (words / sentence_count(col))
        - F.lit(84.6) * (syllable_count(col) / words)
    )
