"""Unit tests transcribing the reference's inline test suites against our
Spark expressions (SURVEY.md §5.1; FIXTURES.md §3).

Sources of truth:
  collection grammar   /root/reference/src/entries/entry.rs:336-399
  filename parts       entry.rs:307-333
  naming rules         /root/reference/src/medias/naming.rs:144-289
  natural sort         /root/reference/src/utils/natural.rs:107-176
  clean_words          /root/reference/src/commands/dupes.rs:505-557
  kind classify        dupes.rs:559-585
  sequential detector  dupes.rs:332-405
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from refine_spark.clean import classify_kind, cleaned_name_cols
from refine_spark.cluster import is_likely_sequential
from refine_spark.listing import natural_key
from refine_spark.naming import apply_rules_col, compile_rules
from refine_spark.scan import collection_parts, ext_of, stem_of


def _eval_exprs(spark, exprs: dict[str, F.Column]) -> dict:
    """Evaluate many literal expressions in ONE single-row select."""
    row = spark.range(1).select(*[e.alias(k) for k, e in exprs.items()]).collect()[0]
    return row.asDict()


# ---- filename parts ------------------------------------------------------------

FILENAME_CASES = [
    ("foo", "foo", ""),
    ("foo.bar", "foo", "bar"),
    ("foo.bar.baz", "foo.bar", "baz"),
    (".foo", ".foo", ""),
    (".foo.bar", ".foo", "bar"),
    (".foo.bar.baz", ".foo.bar", "baz"),
]


def test_filename_parts(spark):
    exprs = {}
    for i, (name, _, _) in enumerate(FILENAME_CASES):
        exprs[f"stem_{i}"] = stem_of(F.lit(name))
        exprs[f"ext_{i}"] = ext_of(F.lit(name))
    got = _eval_exprs(spark, exprs)
    for i, (name, stem, ext) in enumerate(FILENAME_CASES):
        assert got[f"stem_{i}"] == stem, name
        assert got[f"ext_{i}"] == ext, name


# ---- collection grammar --------------------------------------------------------

NO_MATCH = [
    "foo", "foo bar", "foo bar - baz", "foo - 2025 - 24", "_foo_-24",
    "foo ~ 24", "foo~ 24", "foo+bar", "foo+bar,baz", "foo+bar ~ 24",
    "foo ~24", "foo bar~24", "foo bar ~24", "_foo_ ~24", "foo - 33~24",
    "foo+ ~24", "foo+ asd~24", "foo+asd ~24", "foo+~24", ",~24",
    "foo+,~24", "foo+bar,~24", "foo+bar,~24 cool",
]
MATCH = [
    ("foo~24", ("foo", None, 24, "")),
    ("foo_~24", ("foo_", None, 24, "")),
    ("__foo~24", ("__foo", None, 24, "")),
    ("_foo__~24", ("_foo__", None, 24, "")),
    ("foo+bar~24", ("foo", "bar", 24, "")),
    ("foo_bar__+_baz__~24", ("foo_bar__", "_baz__", 24, "")),
    ("foo~24cool", ("foo", None, 24, "cool")),
    ("foo~24 cool", ("foo", None, 24, " cool")),
    ("foo_~24-nice!", ("foo_", None, 24, "-nice!")),
    ("__foo~24 ?why?", ("__foo", None, 24, " ?why?")),
    ("_foo__~24 - cut", ("_foo__", None, 24, " - cut")),
    ("foo+bar~24 seen 3 times", ("foo", "bar", 24, " seen 3 times")),
    ("_foo+__bar_~24 with comment!", ("_foo", "__bar_", 24, " with comment!")),
]


def test_collection_parts(spark):
    exprs = {
        f"c_{i}": collection_parts(F.lit(stem))
        for i, stem in enumerate(NO_MATCH + [m[0] for m in MATCH])
    }
    got = _eval_exprs(spark, exprs)
    for i, stem in enumerate(NO_MATCH):
        c = got[f"c_{i}"]
        assert (c["canonical"], c["alias"], c["seq"], c["comment"]) == (
            stem, None, None, "",
        ), stem
    for j, (stem, exp) in enumerate(MATCH):
        c = got[f"c_{len(NO_MATCH) + j}"]
        assert (c["canonical"], c["alias"], c["seq"], c["comment"]) == exp, stem


# ---- naming rules ---------------------------------------------------------------

STRIP_CASES = [
    # (family_idx, rule, input, expected)
    (0, "Before", "beforefoo", "foo"),
    (0, "Before", "Before__foo", "__foo"),
    (0, "Before", "before foo", "foo"),
    (0, "before", "Before - foo", "foo"),
    (0, "before", "before.foo", "foo"),
    (0, "before", "Before\t.  foo", "foo"),
    (1, "After", "fooafter", "foo"),
    (1, "After", "foo__After", "foo__"),
    (1, "After", "foo after", "foo"),
    (1, "after", "foo - After", "foo"),
    (1, "after", "foo.after", "foo"),
    (1, "after", "foo\t. After", "foo"),
    (2, "Exact", "foo__Exact", "foo__"),
    (2, "Exact", "foo exact", "foo"),
    (2, "exact", "foo - Exact", "foo"),
    (2, "exact", "foo.exact", "foo"),
    (2, "exact", "foo\t. Exact", "foo"),
    (2, "Exact", "Exact__foo", "__foo"),
    (2, "Exact", "exact foo", "foo"),
    (2, "exact", "Exact - foo", "foo"),
    (2, "exact", "exact.foo", "foo"),
    (2, "Exact", "Exact\t.  foo", "foo"),
    (2, "Exact", "foo__Exactbar", "foo__bar"),
    (2, "Exact", "foo exact bar", "foo bar"),
    (2, "exact", "foo.exact.bar", "foo.bar"),
    (2, "Exact", "foo\t.  Exact - bar", "foo - bar"),
    (2, "exact", "foo - Exactbar", "foo - bar"),
    (2, "Exact", "foo__Exact bar", "foo__ bar"),
    (2, "Exact", "fooExact bar", "foo bar"),
    (2, "(exact)", "foo - (Exact)bar", "foo - bar"),
    (2, "(Exact)", "foo__(Exact) bar", "foo__ bar"),
    (2, "Exact", "foo(Exact) bar", "foo bar"),
    (2, "Exact", "fexactoo", "foo"),
    (2, "Exact", "fexactoExacto", "foo"),
    (2, "exact", "Exactfoo bar", "foo bar"),
]

REPLACE_CASES = [
    ([("-+", "-")], "foo---bar", "foo-bar"),
    ([(r"(\w+) +(\w+)", "$2 $1")], "foo  bar", "bar foo"),
    ([(r"(.+)(S0\dE0\d)", "$2.$1")], "fooS03E05", "S03E05.foo"),
]

THROW_CASES = [
    ([("God.?of.?War", "God of War")], "other things", "other things"),
    ([("God.?of.?War", "God of War")], "God of War media", "media - God of War"),
    ([("God.?of.?War", "God of War")], "godofwar -  media", "media - God of War"),
    ([("God{S}of{S}War", "God of War")], "other things", "other things"),
    ([("God{S}of{S}War", "God of War")], "God of War media", "media - God of War"),
    ([("God{S}*of{S}*War", "God of War")], "godofwar media", "media - God of War"),
    ([("God{S}of{S}War", "God of War")], "God-of-War media", "media - God of War"),
    ([("God{S}*of{S}*War", "God of War")], "godofwar -  media", "media - God of War"),
]


def test_naming_rules(spark):
    exprs = {}
    expected = {}
    for i, (fam, rule, inp, exp) in enumerate(STRIP_CASES):
        kw = [[], [], []]
        kw[fam] = [rule]
        rules = compile_rules(*kw)
        exprs[f"s_{i}"] = apply_rules_col(F.lit(inp), rules)
        expected[f"s_{i}"] = exp
    for i, (rep, inp, exp) in enumerate(REPLACE_CASES):
        rules = compile_rules(replace=rep)
        exprs[f"r_{i}"] = apply_rules_col(F.lit(inp), rules)
        expected[f"r_{i}"] = exp
    for i, (thr, inp, exp) in enumerate(THROW_CASES):
        rules = compile_rules(throw=thr)
        exprs[f"t_{i}"] = apply_rules_col(F.lit(inp), rules)
        expected[f"t_{i}"] = exp
    got = _eval_exprs(spark, exprs)
    for k, exp in expected.items():
        assert got[k] == exp, f"{k}: {got[k]!r} != {exp!r}"


def test_naming_cleared(spark):
    # naming.rs:275-289: rules clear 4 of 5 names; 'foobar' -> 'foo'
    rules = compile_rules(
        strip_before=["e"], strip_after=["b"], strip_exact=["c.*i"],
        replace=[("on", "")],
    )
    df = spark.createDataFrame(
        pd.DataFrame({"new_name": ["file", "batch", "collection", "refine", "foobar"]})
    )
    from refine_spark.naming import apply_naming

    out = apply_naming(df, rules).collect()
    assert sum(r["blocked"] for r in out) == 4
    survivors = [r["new_name"] for r in out if not r["blocked"]]
    assert survivors == ["foo"]


# ---- natural sort ----------------------------------------------------------------

NATURAL_CASES = [
    (["2", "10", "1"], ["1", "2", "10"]),
    (["b", "c", "a"], ["a", "b", "c"]),
    (["file1", "file10", "file2"], ["file1", "file2", "file10"]),
    (
        ["file1", "file1B", "file00", "file11", "file0002"],
        ["file00", "file1", "file1B", "file0002", "file11"],
    ),
    (
        ["file-10", "file-1", "file-1-2", "file-2", "file-1-10"],
        ["file-1", "file-1-2", "file-1-10", "file-2", "file-10"],
    ),
    (
        ["file01", "file1", "file10", "file001"],
        ["file1", "file01", "file001", "file10"],
    ),
    (["", "file1", ""], ["", "", "file1"]),
]


def test_natural_sort(spark):
    for values, expected in NATURAL_CASES:
        df = spark.createDataFrame(pd.DataFrame({"v": values}))
        got = [r["v"] for r in df.orderBy(natural_key(F.col("v"))).collect()]
        assert got == expected, values


# ---- clean_words ------------------------------------------------------------------

CLEAN_CASES = [
    ("Vidéo de Ação", "video acao"),
    ("The.Movie.2020.1080p.WEB-DL.x264", "movie 2020"),
    ("The of and", "the of and"),           # all stopwords -> fallback base
    ("foo_bar", "foo bar"),                  # underscores are separators
    ("Ação", "acao"),
    ("Bluray", "bluray"),                    # tag strip empties -> fallback
    ("Show.S01E05.720p.HDTV.AC3", "show s01e05"),
    ("Os Filmes do Brasil", "filmes brasil"),
]


def test_clean_words(spark):
    cleaned, _ = cleaned_name_cols(F.col("name"))
    df = spark.createDataFrame(pd.DataFrame({"name": [c[0] for c in CLEAN_CASES]}))
    got = {r["name"]: r["c"] for r in df.withColumn("c", cleaned).collect()}
    for raw, exp in CLEAN_CASES:
        assert got[raw] == exp, raw


# ---- kind classification ------------------------------------------------------------

KIND_CASES = [
    ("mkv", "video"), ("webm", "video"), ("mp4", "video"),
    ("srt", "subtitle"), ("csv", "text"), ("pdf", "document"),
    ("zip", "archive"), ("JPG", "image"), ("mp3", "audio"),
    ("xyz", "unknown"), ("", "unknown"),
]


def test_kind_classify(spark):
    exprs = {f"k_{i}": classify_kind(F.lit(e)) for i, (e, _) in enumerate(KIND_CASES)}
    got = _eval_exprs(spark, exprs)
    for i, (ext, exp) in enumerate(KIND_CASES):
        assert got[f"k_{i}"] == exp, ext


# ---- sequential detector (pure python transcription) ---------------------------------


@pytest.mark.parametrize(
    "names,expected",
    [
        (["show s01e01", "show s01e02", "show s01e03"], True),
        (["movie 2020", "movie 2020 extended"], False),
        (["alpha", "beta"], False),
        (["part 1", "part 2", "intro"], True),
        (["one"], False),
        (["same 5", "same 5"], False),
        (["a 1 2", "a 1 3", "a 1 4"], True),
    ],
)
def test_is_likely_sequential(names, expected):
    assert is_likely_sequential(names) is expected
