"""Dir-row universe / traversal modes (S3) + dir-aware rename + list-by-count.

The expectations transcribe the reference's traversal dispatch
(/root/reference/src/entries/mod.rs:91-117) onto a small fixed tree:

  host/
    alpha/            (matches dir filter in the *_match scenarios)
      a1.mp4
      beta/
        b1.mp4
    .secret/
      s1.mp4
    gamma/
      g1.txt
    top.mp4
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from refine_spark.apply import apply_rename_with_dirs
from refine_spark.listing import list_plan
from refine_spark.universe import entry_universe, validate_roots

URLS = [
    "http://host/alpha/a1.mp4",
    "http://host/alpha/beta/b1.mp4",
    "http://host/.secret/s1.mp4",
    "http://host/gamma/g1.txt",
    "http://host/top.mp4",
]


@pytest.fixture(scope="module")
def tree(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def _paths(df):
    return sorted((r["path"], r["is_dir"]) for r in df.collect())


def test_files_mode_skips_hidden_subtrees(tree):
    # mod.rs:111-113 — hidden dirs are not recursed; hidden files skipped
    got = _paths(entry_universe(tree, "files"))
    assert got == sorted(
        (u, False) for u in URLS if "/.secret/" not in u
    )


def test_files_mode_depth(tree):
    # Depth::deeper (mod.rs:152-158): max_depth=1 -> only root children
    got = _paths(entry_universe(tree, "files", max_depth=1))
    assert got == [("http://host/top.mp4", False)]
    got2 = _paths(entry_universe(tree, "files", max_depth=2))
    assert got2 == sorted(
        [("http://host/alpha/a1.mp4", False), ("http://host/gamma/g1.txt", False),
         ("http://host/top.mp4", False)]
    )


def test_dirs_stop_yields_matching_dir_and_stops(tree):
    # mod.rs:104-106: a matching dir is yielded, NOT recursed — files
    # under it disappear from the universe
    got = _paths(entry_universe(tree, "dirs_stop", include={"dir": "^alpha$"}))
    # the dir axis constrains FILES' parents too (filter.rs:81), so the
    # only survivor is the matching dir itself — its content unreached
    assert got == [("host/alpha", True)]
    # without an include, every visible dir matches -> join yields the
    # top-level dirs and the root's own files (join.rs:81 DirsStop)
    got2 = _paths(entry_universe(tree, "dirs_stop"))
    assert got2 == sorted(
        [("host/alpha", True), ("host/gamma", True),
         ("http://host/top.mp4", False)]
    )


def test_dirs_and_content_yields_both(tree):
    got = _paths(entry_universe(tree, "dirs_and_content", include={"dir": "^(alpha|beta)$"}))
    # both dirs yielded AND recursion continued under alpha
    assert ("host/alpha", True) in got
    assert ("host/alpha/beta", True) in got


def test_dirs_and_content_unfiltered_yields_all_visible_dirs(tree):
    got = _paths(entry_universe(tree, "dirs_and_content"))
    dirs = [p for p, d in got if d]
    # hidden dirs never match the filter (filter.rs:67) -> not yielded
    assert dirs == sorted(["host/alpha", "host/alpha/beta", "host/gamma"])
    files = [p for p, d in got if not d]
    assert "http://host/alpha/beta/b1.mp4" in files


def test_content_over_dirs_switches_at_max_depth(tree):
    # list semantics (list.rs:56): files while recursing, dirs AT the max
    got = _paths(entry_universe(tree, "content_over_dirs", max_depth=2))
    assert ("host/alpha/beta", True) in got  # dir at level 2
    assert ("http://host/alpha/a1.mp4", False) in got  # file at level 2
    assert all(p != "host/alpha" for p, d in got if d)  # level-1 dir recursed
    # unlimited depth -> no dir rows at all
    got_full = _paths(entry_universe(tree, "content_over_dirs"))
    assert all(not d for _, d in got_full)


def test_rename_with_dirs_rewrites_descendants(spark, tree):
    # rename.rs:48 (DirsAndContent): renaming a dir carries its content;
    # deepest-first apply order means both levels rename independently
    plan = spark.createDataFrame(
        [
            ("host/alpha", "alpha", "Alpha Clean", True, False, True),
            ("host/alpha/beta", "beta", "Beta Clean", True, False, True),
            ("http://host/alpha/beta/b1.mp4", "b1.mp4", "b1-clean.mp4", True, False, False),
            ("http://host/top.mp4", "top.mp4", "top.mp4", False, False, False),
        ],
        "url string, name string, new_name string, changed boolean, blocked boolean, is_dir boolean",
    )
    out = {r["url"] for r in apply_rename_with_dirs(tree, plan).collect()}
    assert "http://host/Alpha Clean/a1.mp4" in out
    assert "http://host/Alpha Clean/Beta Clean/b1-clean.mp4" in out
    assert "http://host/top.mp4" in out
    assert "http://host/gamma/g1.txt" in out  # untouched subtree


def test_list_by_count(spark):
    rows = [
        ("u/a", "a", 10, 3),
        ("u/b", "b", 99, 1),
        ("u/c", "c", 5, None),
        ("u/d", "d", 7, 3),
    ]
    df = spark.createDataFrame(rows, "url string, name string, size long, count long")
    got = [r["url"] for r in list_plan(df, by="count").collect()]
    # count desc (list.rs ORDERING rev-default), natural-path secondary,
    # nulls last (Option cmp reversed)
    assert got == ["u/a", "u/d", "u/b", "u/c"]
    rev = [r["url"] for r in list_plan(df, by="count", rev=True).collect()]
    assert rev == ["u/c", "u/b", "u/a", "u/d"]


def test_validate_roots():
    roots, dropped = validate_roots(["/b", "/a", "/b"])
    assert roots == ["/a", "/b"] and dropped == 1
    assert validate_roots([]) == (["."], 0)
