"""Command-plan tests: rebuild, rename, join, listing, probe."""

from __future__ import annotations

from datetime import datetime, timezone

import pandas as pd

from refine_spark.listing import dir_totals, list_plan
from refine_spark.probe import deduped_names, probe_names
from refine_spark.rebuild import rebuild_plan
from refine_spark.rename_join import join_plan, join_receipt, rename_plan


def _docs(spark, rows):
    """rows: list of (url, stem, ext, warc_ts-seconds)."""
    data = [
        (
            r[0],
            r[0].rsplit("/", 1)[-1],
            r[1],
            r[2],
            datetime(2024, 1, 1, tzinfo=timezone.utc)
            .replace(second=0, minute=r[3] % 60, hour=r[3] // 60),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "url string, name string, stem string, ext string, warc_ts timestamp"
    )


def test_rebuild_full_mode(spark):
    # three files in one smart-match group + one unrelated file;
    # full mode renumbers 1..n ordered by created
    rows = [
        ("http://h/d/FOO_BAR~3.mp4", "FOO_BAR~3", "mp4", 2),
        ("http://h/d/foo_bar~1.mp4", "foo_bar~1", "mp4", 1),
        ("http://h/d/FooBar.mp4", "FooBar", "mp4", 3),
        ("http://h/d/other~7.txt", "other~7", "txt", 4),
    ]
    plan = rebuild_plan(_docs(spark, rows))
    got = {r["url"]: r for r in plan.collect()}
    # smart match strips spaces/underscores; default (lowercase) mode picks
    # the LONGEST name as representative ('foo_bar', len 7)
    names = {u: got[u]["new_name"] for u in got}
    assert names["http://h/d/foo_bar~1.mp4"] == "foo_bar~1.mp4"
    assert names["http://h/d/FOO_BAR~3.mp4"] == "foo_bar~2.mp4"
    assert names["http://h/d/FooBar.mp4"] == "foo_bar~3.mp4"
    assert names["http://h/d/other~7.txt"] == "other~1.txt"
    # changed flags
    assert got["http://h/d/other~7.txt"]["changed"]
    assert not got["http://h/d/foo_bar~1.mp4"]["changed"]


def test_rebuild_partial_mode_keeps_seqs(spark):
    rows = [
        ("http://h/d/show~2.mkv", "show~2", "mkv", 5),
        ("http://h/d/show~5.mkv", "show~5", "mkv", 1),
        ("http://h/d/show extra.mkv", "show extra", "mkv", 9),
    ]
    plan = rebuild_plan(_docs(spark, rows), partial=True)
    got = {r["url"]: r["new_seq"] for r in plan.collect()}
    assert got["http://h/d/show~2.mkv"] == 2
    assert got["http://h/d/show~5.mkv"] == 5
    # 'show extra' is its own smart group (different canonical), seq 6? no:
    # group key differs -> gets its own sequence starting at max+1 = 1
    assert got["http://h/d/show extra.mkv"] == 1


def test_rebuild_case_mode_keeps_case(spark):
    # case mode: names keep their case; smart-match groups are
    # case-sensitive (only separator variants group together), so the
    # uppercase-count election ties and the last in sort order wins
    rows = [
        ("http://h/d/FOO_Bar~1.mp4", "FOO_Bar~1", "mp4", 1),
        ("http://h/d/FOOBar~2.mp4", "FOOBar~2", "mp4", 2),
    ]
    plan = rebuild_plan(_docs(spark, rows), case=True)
    got = {r["url"]: r["new_name"] for r in plan.collect()}
    assert got["http://h/d/FOO_Bar~1.mp4"] == "FOOBar~1.mp4"
    assert got["http://h/d/FOOBar~2.mp4"] == "FOOBar~2.mp4"


def test_rename_sequence_clash(spark):
    # two files rename to the same name in one parent -> -1, -2 suffixes
    rows = [
        ("http://h/d/a old.txt", "a old", "txt", 1),
        ("http://h/d/b old.txt", "b old", "txt", 2),
        ("http://h/e/c old.txt", "c old", "txt", 3),
    ]
    from refine_spark.naming import compile_rules

    rules = compile_rules(replace=[(r"^[abc] ", "x ")])
    plan = rename_plan(_docs(spark, rows), rules, clashes="sequence")
    got = {r["url"]: r for r in plan.collect()}
    d_names = sorted(
        got[u]["new_name"] for u in got if u.startswith("http://h/d/")
    )
    assert d_names == ["x old-1.txt", "x old-2.txt"]
    assert got["http://h/e/c old.txt"]["new_name"] == "x old.txt"
    assert not got["http://h/e/c old.txt"]["clash"]


def test_rename_forbid_blocks_parent(spark):
    rows = [
        ("http://h/d/a old.txt", "a old", "txt", 1),
        ("http://h/d/b old.txt", "b old", "txt", 2),
    ]
    from refine_spark.naming import compile_rules

    rules = compile_rules(replace=[(r"^[ab] ", "x ")])
    plan = rename_plan(_docs(spark, rows), rules, clashes="forbid")
    assert all(r["blocked"] for r in plan.collect())


def test_rename_ignore_drops_clashing(spark):
    rows = [
        ("http://h/d/a old.txt", "a old", "txt", 1),
        ("http://h/d/b old.txt", "b old", "txt", 2),
    ]
    from refine_spark.naming import compile_rules

    rules = compile_rules(replace=[(r"^[ab] ", "x ")])
    plan = rename_plan(_docs(spark, rows), rules, clashes="ignore")
    assert all(not r["changed"] for r in plan.collect())


def test_join_name_sequence(spark):
    src = _docs(
        spark,
        [
            ("http://h/d1/report.txt", "report", "txt", 1),
            ("http://h/d2/report.txt", "report", "txt", 2),
            ("http://h/d2/unique.txt", "unique", "txt", 3),
        ],
    )
    target = _docs(
        spark,
        [
            ("http://h/t/report-2.txt", "report-2", "txt", 4),
        ],
    )
    plan = join_plan(src, target, "http://h/t", clashes="name_sequence")
    got = {r["url"]: r for r in plan.collect()}
    # first 'report' keeps its name, second gets a free sequence skipping
    # the target's taken 'report-2.txt'
    seqs = sorted(
        got[u]["new_name"]
        for u in got
        if got[u]["origin"] == "src" and got[u]["new_name"] is not None
    )
    assert seqs == ["report-3.txt"]
    receipt = join_receipt(plan).collect()[0]
    assert receipt["clashes"] >= 1


def test_join_name_sequence_long_taken_run(spark):
    """Reference parity (join.rs:126-135): the shared per-group counter
    never gives up — with taken names report-2..report-7 (6 consecutive,
    beyond round-2's max_fix_iters=4) the three renamed members get the
    first three FREE integers 8, 9, 10. A second group exercises the
    gap-skipping order statistic (taken {2, 4} -> free 3, 5), and an
    extension-less group exercises the no-dot decomposition."""
    src = _docs(
        spark,
        [
            ("http://h/d1/report.txt", "report", "txt", 1),
            ("http://h/d2/report.txt", "report", "txt", 2),
            ("http://h/d3/report.txt", "report", "txt", 3),
            ("http://h/d4/report.txt", "report", "txt", 4),
            ("http://h/d1/notes.txt", "notes", "txt", 5),
            ("http://h/d2/notes.txt", "notes", "txt", 6),
            ("http://h/d3/notes.txt", "notes", "txt", 7),
            ("http://h/d1/raw", "raw", "", 8),
            ("http://h/d2/raw", "raw", "", 9),
        ],
    )
    target = _docs(
        spark,
        [(f"http://h/t/report-{i}.txt", f"report-{i}", "txt", 10 + i)
         for i in range(2, 8)]
        + [
            ("http://h/t/notes-2.txt", "notes-2", "txt", 30),
            ("http://h/t/notes-4.txt", "notes-4", "txt", 31),
            ("http://h/t/raw-2", "raw-2", "", 32),
            # decoys that must NOT block anything: wrong ext, leading
            # zero, non-integer tail
            ("http://h/t/notes-3.md", "notes-3", "md", 33),
            ("http://h/t/notes-05.txt", "notes-05", "txt", 34),
            ("http://h/t/raw-x3", "raw-x3", "", 35),
        ],
    )
    plan = join_plan(src, target, "http://h/t", clashes="name_sequence")
    renamed = {
        r["url"]: r["new_name"]
        for r in plan.collect()
        if r["new_name"] is not None
    }
    assert renamed == {
        "http://h/d2/report.txt": "report-8.txt",
        "http://h/d3/report.txt": "report-9.txt",
        "http://h/d4/report.txt": "report-10.txt",
        "http://h/d2/notes.txt": "notes-3.txt",
        "http://h/d3/notes.txt": "notes-5.txt",
        "http://h/d2/raw": "raw-3",
    }


def test_join_in_place_detection(spark):
    src = _docs(spark, [("http://h/t/already.txt", "already", "txt", 1)])
    target = _docs(spark, [])
    plan = join_plan(src, target, "http://h/t")
    rows = plan.collect()
    assert rows[0]["in_place"]


def test_list_and_dir_totals(spark):
    pdf = pd.DataFrame(
        {
            "url": ["http://h/a/f2.txt", "http://h/a/f10.txt", "http://h/b/g.txt"],
            "name": ["f2.txt", "f10.txt", "g.txt"],
            "size": [100, 50, 10],
        }
    )
    df = spark.createDataFrame(pdf)
    by_size = [r["name"] for r in list_plan(df, by="size").collect()]
    assert by_size == ["f2.txt", "f10.txt", "g.txt"]
    by_name = [r["name"] for r in list_plan(df, by="name").collect()]
    assert by_name == ["f2.txt", "f10.txt", "g.txt"]  # natural: 2 < 10
    totals = {r["dir"]: (r["total_size"], r["n_files"]) for r in dir_totals(df).collect()}
    assert totals["http://h/a"] == (150, 2)
    assert totals["http://h/b"] == (10, 1)


def test_probe_with_fake_client(spark):
    pdf = pd.DataFrame(
        {
            "url": [
                "http://h/d/alpha~1.txt",
                "http://h/d/alpha~2.txt",
                "http://h/d/beta~1.txt",
                "http://h/d/gone~1.txt",
                "http://h/d/flaky~1.txt",
            ],
            "stem": ["alpha~1", "alpha~2", "beta~1", "gone~1", "flaky~1"],
        }
    )
    df = spark.createDataFrame(pdf)
    names = deduped_names(df)
    assert names.count() == 4  # alpha deduped

    def fake(name: str) -> int:
        if name == "gone":
            return 404
        if name == "flaky":
            raise OSError("boom")
        return 200

    verdicts = {r["name"]: r["verdict"] for r in probe_names(names, fake).collect()}
    assert verdicts["alpha"] == "valid"
    assert verdicts["gone"] == "invalid"
    assert verdicts["flaky"] == "failed"


def test_fetch_filter_axes(spark):
    from refine_spark.scan import fetch_filter

    rows = [
        ("http://h/docs/report.txt", "report", "txt", 1),
        ("http://h/docs/.hidden.txt", ".hidden", "txt", 2),
        ("http://h/img/photo.jpg", "photo", "jpg", 3),
        ("http://h/docs/REPORT2.TXT", "REPORT2", "TXT", 4),
    ]
    df = _docs(spark, rows)
    # hidden always excluded; ext include is case-insensitive
    got = {r["url"] for r in fetch_filter(df, include={"ext": "^txt$"}).collect()}
    assert got == {"http://h/docs/report.txt", "http://h/docs/REPORT2.TXT"}
    # dir axis matches the parent segment
    got = {r["url"] for r in fetch_filter(df, include={"dir": "^img$"}).collect()}
    assert got == {"http://h/img/photo.jpg"}
    # exclude wins over include (AND of both constraints)
    got = {
        r["url"]
        for r in fetch_filter(
            df, include={"ext": "txt"}, exclude={"file": "2$"}
        ).collect()
    }
    assert got == {"http://h/docs/report.txt"}
    # keep_hidden opt-in
    got = {r["url"] for r in fetch_filter(df, keep_hidden=True).collect()}
    assert "http://h/docs/.hidden.txt" in got
