"""Name cleaning / tokenization / kind classification (SURVEY.md §2.2 P4-P6).

Semantics follow the reference's `clean_words` (/root/reference/src/commands/
dupes.rs:505-557) and `classify_media_kind` (dupes.rs:559-585):

  1. transliterate to ASCII (deunicode) and lowercase
  2. strip multi-token release tags (web-dl, blu-ray, ... with '[ .-]?' seps)
  3. tokenize on letters+digits runs (no underscores)
  4. drop EN+PT stopwords / release words
  5. if nothing survives, fall back to the *pre-tag-strip* lowercased base

Spark-first split: step 1 is the one mandatory scalar pandas UDF (Arrow
batches, never per-row Python); steps 2-5 are pure Catalyst builtins
(`regexp_replace`, `regexp_extract_all`, higher-order `filter`).
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column, functions as F, types as T

from .config import STOPWORDS, TAGS_MULTI_PATTERN

# A small supplement for characters NFKD alone cannot decompose to ASCII;
# mirrors the visible behavior of the reference's `deunicode` on common
# European text (full deunicode tables are out of scope; tests pin these).
_TRANSLIT_EXTRA = {
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE", "ø": "o", "Ø": "O",
    "ß": "ss", "đ": "d", "Đ": "D", "ħ": "h", "Ħ": "H", "ł": "l", "Ł": "L",
    "þ": "th", "Þ": "Th", "ð": "d", "Ð": "D", "ı": "i", "ŋ": "ng", "Ŋ": "NG",
    "–": "-", "—": "-", "‘": "'", "’": "'", "“": '"', "”": '"', "…": "...",
}


def _translit_str(s: str) -> str:
    if s is None:
        return None
    s = "".join(_TRANSLIT_EXTRA.get(c, c) for c in s)
    decomposed = unicodedata.normalize("NFKD", s)
    return "".join(c for c in decomposed if not unicodedata.combining(c) and ord(c) < 128)


@F.pandas_udf(T.StringType())
def translit_udf(s: pd.Series) -> pd.Series:
    """Vectorized ASCII transliteration (the reference's deunicode step)."""
    return s.map(_translit_str, na_action="ignore")


def _stopwords_array() -> Column:
    return F.array(*[F.lit(w) for w in STOPWORDS])


def cleaned_name_cols(name: Column) -> tuple[Column, Column]:
    """Return (cleaned_name, tokens) columns implementing clean_words.

    cleaned_name is the space-joined surviving tokens, or the lowercased
    transliterated base when all tokens were removed (dupes.rs:553-556).
    """
    base = F.lower(translit_udf(name))
    detagged = F.regexp_replace(base, TAGS_MULTI_PATTERN, "")
    raw_tokens = F.regexp_extract_all(detagged, F.lit(r"[\p{L}0-9]+"), 0)
    sw = _stopwords_array()
    tokens = F.filter(raw_tokens, lambda t: ~F.array_contains(sw, t))
    cleaned = F.when(F.size(tokens) == 0, base).otherwise(F.array_join(tokens, " "))
    # tokens of the final cleaned name (covers the fallback case too)
    final_tokens = F.when(F.size(tokens) == 0, F.split(F.trim(base), r"\s+")).otherwise(tokens)
    return cleaned, final_tokens


def with_cleaned_name(df, name_col: str = "stem"):
    cleaned, tokens = cleaned_name_cols(F.col(name_col))
    return df.withColumn("cleaned_name", cleaned).withColumn("tokens", tokens)


# ---- media-kind classification (P5, dupes.rs:559-585) -------------------------

# extension -> kind lookup table reproducing the reference's outcome:
# MIME top-level guess with explicit overrides. Expressed as a map literal
# so Catalyst evaluates it JVM-side (no UDF).
_KIND_BY_EXT: dict[str, str] = {}
for _ext in ("mp4 avi mov wmv flv mpg mpeg m4v 3gp ts "
             "mkv webm rmvb m2ts mts f4v vob ogv").split():
    _KIND_BY_EXT[_ext] = "video"
for _ext in "mp3 wav flac ogg oga m4a aac wma opus mid midi aiff".split():
    _KIND_BY_EXT[_ext] = "audio"
for _ext in "jpg jpeg png gif bmp webp tiff tif svg ico heic avif".split():
    _KIND_BY_EXT[_ext] = "image"
for _ext in "txt md html htm css js log text csv json xml yaml yml ini conf".split():
    _KIND_BY_EXT[_ext] = "text"
for _ext in "pdf doc docx xls xlsx ppt pptx odt ods odp rtf".split():
    _KIND_BY_EXT[_ext] = "document"
for _ext in "zip rar 7z tar gz bz2 xz lz lzma iso cab arj z".split():
    _KIND_BY_EXT[_ext] = "archive"
for _ext in "srt ass ssa sub vtt idx sup".split():
    _KIND_BY_EXT[_ext] = "subtitle"
for _ext in "bin exe dll so dmg apk jar wasm".split():
    _KIND_BY_EXT[_ext] = "application"


def classify_kind(ext: Column) -> Column:
    """Map extension -> media kind; unknown extensions -> 'unknown'."""
    mapping = F.create_map(
        *[F.lit(x) for kv in _KIND_BY_EXT.items() for x in kv]
    )
    return F.coalesce(mapping[F.lower(ext)], F.lit("unknown"))
