"""Plan application: the reference's confirm-then-apply file ops as table
writes (SURVEY.md §2.1 S9-S11).

The reference mutates the filesystem with per-file rename/copy/cross-move
plus retry loops and two-phase renames (/root/reference/src/medias/
ops.rs:9-89, rebuild.rs:203-218). Under MVCC table semantics all of that
collapses to one atomic MERGE: the plan DataFrame joins back to the
table, rows take their new identity, and the swap is a snapshot commit.
On a real deployment this is an Iceberg `MERGE INTO`; this sandbox has no
Iceberg runtime jars, so the same contract is implemented as an atomic
directory swap of parquet (write new snapshot -> rename into place),
which preserves the two essential semantics: readers never see a partial
apply, and a failed apply leaves the old snapshot intact.
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, functions as F


def apply_rename_plan(
    docs: DataFrame, plan: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Return the post-apply table: rows take their plan new_name.

    `plan` needs (url, new_name, changed, blocked); unchanged/blocked rows
    keep their identity. The 'target exists' refusal (ops.rs:20-24)
    becomes an anti-join assertion surfaced as a `conflict` column."""
    p = plan.filter(F.col("changed") & ~F.col("blocked")).select(
        url_col, F.col("new_name")
    )
    new_url = F.when(
        F.col("new_name").isNotNull(),
        F.concat(F.regexp_replace(F.col(url_col), r"/[^/]*$", "/"), F.col("new_name")),
    ).otherwise(F.col(url_col))
    applied = docs.join(p, url_col, "left").withColumn("_new_url", new_url).drop(
        "new_name"
    )
    # refuse to overwrite an existing distinct target (two-phase-rename
    # analog): a new url colliding with a kept old url is a conflict
    kept = applied.filter(F.col("_new_url") == F.col(url_col)).select(
        F.col(url_col).alias("_taken")
    )
    flagged = applied.join(
        kept, applied._new_url == F.col("_taken"), "left"
    ).withColumn(
        "conflict",
        (F.col("_taken").isNotNull()) & (F.col("_new_url") != F.col(url_col)),
    ).drop("_taken")
    return (
        flagged.withColumn(
            url_col,
            F.when(F.col("conflict"), F.col(url_col)).otherwise(F.col("_new_url")),
        )
        .drop("_new_url")
    )


def apply_rename_with_dirs(
    docs: DataFrame, plan: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Post-apply table for a plan that contains DIRECTORY rows
    (DirsAndContent traversal — rename.rs:48 renames directories too):
    a renamed directory carries its content, so every descendant url
    rewrites the corresponding path segment.

    The reference applies deepest-first so a dir rename never
    invalidates a deeper pending rename (O4, rename.rs apply order);
    declaratively that collapses to "each ancestor segment maps
    independently by its ORIGINAL prefix path". Plan needs (url, name,
    new_name, changed, blocked, is_dir); dir rows use the scheme-less
    prefix path as url (universe.entry_universe convention).

    One explode + one join + one groupBy over the file table — linear,
    no iteration over depth."""
    scheme = F.regexp_extract(F.col(url_col), r"^([a-z][a-z0-9+.\-]*://)", 1)
    segs = F.split(F.regexp_replace(F.col(url_col), r"^[a-z][a-z0-9+.\-]*://", ""), "/")

    live = plan.filter(F.col("changed") & ~F.col("blocked"))
    dir_map = live.filter(F.col("is_dir")).select(
        F.col(url_col).alias("prefix"), F.col("new_name").alias("dir_new")
    )
    file_map = live.filter(~F.col("is_dir")).select(
        F.col(url_col).alias("furl"), F.col("new_name").alias("leaf_new")
    )

    base = docs.withColumn("_segs", segs).withColumn("_scheme", scheme)
    # ancestor prefixes at levels 1..L-1 (level i renames segment i+1)
    alevels = F.when(
        F.size("_segs") >= 3, F.sequence(F.lit(1), F.size("_segs") - 2)
    ).otherwise(F.array().cast("array<int>"))
    pref = base.select(
        F.col(url_col),
        F.explode(alevels).alias("lvl"),
        F.array_join(F.slice("_segs", 1, F.col("lvl") + 1), "/").alias("prefix"),
    )
    hits = (
        pref.join(dir_map, "prefix")
        .groupBy(url_col)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("lvl"), F.col("dir_new")))
            ).alias("_seg_map")
        )
    )
    joined = (
        base.join(hits, url_col, "left")
        .join(file_map, base[url_col] == F.col("furl"), "left")
        .drop("furl")
    )
    new_segs = F.transform(
        "_segs",
        lambda s, i: F.when(
            i == F.size("_segs") - 1, F.coalesce(F.col("leaf_new"), s)
        ).otherwise(
            F.coalesce(
                F.when(
                    F.col("_seg_map").isNotNull(), F.element_at("_seg_map", i)
                ),
                s,
            )
        ),
    )
    return (
        joined.withColumn(
            url_col, F.concat(F.col("_scheme"), F.array_join(new_segs, "/"))
        )
        .drop("_segs", "_scheme", "_seg_map", "leaf_new")
    )


def atomic_overwrite(df: DataFrame, table_dir: str) -> str:
    """Snapshot-commit a table directory: write beside, swap atomically.

    Emulates Iceberg's snapshot isolation on plain parquet: a crash
    before the final rename leaves the previous snapshot untouched."""
    staging = f"{table_dir}.staging-{int(time.time() * 1000)}"
    backup = f"{table_dir}.prev"
    df.write.mode("overwrite").parquet(staging)
    if os.path.exists(backup):
        shutil.rmtree(backup)
    if os.path.exists(table_dir):
        os.rename(table_dir, backup)
    os.rename(staging, table_dir)
    return table_dir


def empty_parents(
    before: DataFrame, after: DataFrame, junk: tuple[str, ...] = (".DS_Store",),
    url_col: str = "url",
) -> DataFrame:
    """S10: directory prefixes emptied by an apply (join.rs:215-237).

    The reference removes source dirs left empty after moving files out
    (deepest-first, treating a lone .DS_Store as empty). The table analog
    compares the prefix universes before/after: a prefix with rows before
    and none after (ignoring junk leaf names) is reported for removal,
    deepest (longest) first. Pure aggregate — two narrow shuffles."""
    from .universe import dir_rows

    live_after = after.filter(
        ~F.element_at(F.split(F.col(url_col), "/"), -1).isin(*junk)
    )
    gone = dir_rows(before.select(F.col(url_col).alias("url"))).select(
        "path", "level"
    ).join(
        dir_rows(live_after.select(F.col(url_col).alias("url"))).select("path"),
        "path",
        "left_anti",
    )
    return gone.orderBy(F.desc("level"), "path").select("path", "level")


def quarantine_split(
    df: DataFrame, ok_predicate, quarantine_dir: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """S5 malformed-row side channel: rows failing the predicate go to a
    quarantine sink instead of dying row-wise (the reference logs+drops,
    commands.rs:102-115)."""
    ok = df.filter(ok_predicate)
    bad = df.filter(~ok_predicate)
    if quarantine_dir:
        bad.write.mode("append").parquet(quarantine_dir)
    return ok, bad
