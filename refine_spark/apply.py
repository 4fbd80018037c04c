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
