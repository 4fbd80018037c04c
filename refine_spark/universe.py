"""Dir-row universe + traversal modes (SURVEY.md §2.1 S3, round-2 gap).

The reference enumerates a filesystem with four traversal modes
(/root/reference/src/entries/mod.rs:20-31, dispatch at mod.rs:91-117):

  Files           only file rows (dupes, probe, rebuild)
  DirsStop        a dir that matches the filter is yielded and NOT
                  recursed into (join)
  DirsAndContent  a matching dir is yielded AND its content recursed
                  (rename — directories are renamed too)
  ContentOverDirs files while recursing; at the max depth the dir itself
                  is yielded instead of its content (list)

Spark-first re-expression: the table has only file rows (urls), so
directory rows are DERIVED — every distinct url prefix below the host.
Recursion does not exist in a declarative plan; the reference's
reachability rules ("was this subtree entered?") become per-ancestor
boolean aggregates:

  mode             ancestor dir `a` permits recursion iff
  Files            !hidden(a)                      (mod.rs:111-113)
  DirsStop         !matched(a) && !hidden(a)       (mod.rs:104-106)
  DirsAndContent   matched(a) || !hidden(a)        (mod.rs:108-110)
  ContentOverDirs  !hidden(a)                      (mod.rs:111-113)

plus the depth rule (Depth::deeper, mod.rs:152-158): entering a dir at
level P requires P < max_depth (or max_depth == 0 = unlimited), so a
node at level L is depth-reachable iff L <= max_depth.

Yield rules (mod.rs:102-117):
  files (all modes)  filter-matched && !hidden && ancestors permit
  DirsStop           matched dirs, any reachable level
  DirsAndContent     matched dirs, any reachable level
  ContentOverDirs    matched dirs exactly AT level == max_depth (> 0)

Filter semantics per entry kind follow FilterRules::is_included
(/root/reference/src/entries/filter.rs:61-86): hidden never matches;
for a DIR the `dir` axis tests its own name and `path` its own full
path (file/ext axes don't apply); for a FILE `file` tests the stem,
`ext` the extension, `dir` the parent's name, `path` the parent's full
path, and `all` the path-without-extension.

Scale note: the ancestor explode runs on the DIRS frame only (distinct
prefixes — orders of magnitude smaller than the file table); files then
join just their immediate parent's aggregated chain value. One explode,
two narrow shuffles, no iteration.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCHEME_RE = r"^[a-z][a-z0-9+.\-]*://"

MODES = ("files", "dirs_stop", "dirs_and_content", "content_over_dirs")


def _tree_segments(url: Column) -> Column:
    """[host, seg1, ..., leaf] — the host is the scan root (level 0)."""
    return F.split(F.regexp_replace(url, _SCHEME_RE, ""), "/")


def _axis_match(
    value: Column, axis: str, include: dict | None, exclude: dict | None
) -> Column:
    """Constraint::is_match (filter.rs:95-100): pass iff no exclude
    matches AND (no include or include matches); case-insensitive like
    scan.fetch_filter."""
    out = F.lit(True)
    if exclude and axis in exclude:
        out = out & ~value.rlike(f"(?i){exclude[axis]}")
    if include and axis in include:
        out = out & value.rlike(f"(?i){include[axis]}")
    return out


def _dir_matched(
    name: Column, path: Column, include: dict | None, exclude: dict | None
) -> Column:
    """FilterRules::is_included for a directory entry (filter.rs:73-77):
    hidden dirs never match; `all` = path (dir stem == name), `dir` =
    own name, `path` = own full path."""
    return (
        ~F.startswith(name, F.lit("."))
        & _axis_match(path, "all", include, exclude)
        & _axis_match(name, "dir", include, exclude)
        & _axis_match(path, "path", include, exclude)
    )


def _file_matched(
    segs: Column, include: dict | None, exclude: dict | None
) -> Column:
    """FilterRules::is_included for a file entry (filter.rs:78-84)."""
    name = F.element_at(segs, -1)
    stem = F.regexp_replace(name, r"(?<=.)\.[^.]+$", "")
    ext = F.regexp_extract(name, r"(?<=.)\.([^.]+)$", 1)
    parent_name = F.element_at(segs, -2)
    parent_path = F.array_join(F.slice(segs, 1, F.size(segs) - 1), "/")
    return (
        ~F.startswith(stem, F.lit("."))
        & _axis_match(F.concat(parent_path, F.lit("/"), stem), "all", include, exclude)
        & _axis_match(stem, "file", include, exclude)
        & _axis_match(ext, "ext", include, exclude)
        & _axis_match(parent_name, "dir", include, exclude)
        & _axis_match(parent_path, "path", include, exclude)
    )


def dir_rows(docs: DataFrame) -> DataFrame:
    """Distinct derived directory rows: (path, name, parent, level).

    Level 1 = a direct child of the scan root (the host); the root
    itself is the user input, never an entry (input.rs:63-99)."""
    segs = _tree_segments(F.col("url"))
    # sequence(a, b) counts DOWN when a > b — guard the no-ancestor case
    levels = F.when(
        F.size(segs) >= 3, F.sequence(F.lit(1), F.size(segs) - 2)
    ).otherwise(F.array().cast("array<int>"))
    exploded = docs.select(
        segs.alias("segs"),
        F.explode(levels).alias("level"),
    )
    return (
        exploded.select(
            F.array_join(F.slice("segs", 1, F.col("level") + 1), "/").alias("path"),
            F.element_at("segs", F.col("level") + 1).alias("name"),
            F.array_join(F.slice("segs", 1, F.col("level")), "/").alias("parent"),
            F.col("level"),
        )
        .dropDuplicates(["path"])
    )


_PERMS = {
    # ancestor-dir recursion permits per mode (mod.rs:102-117)
    "files": lambda m, h: ~h,
    "dirs_stop": lambda m, h: ~m & ~h,
    "dirs_and_content": lambda m, h: m | ~h,
    "content_over_dirs": lambda m, h: ~h,
}


def entry_universe(
    docs: DataFrame,
    mode: str = "files",
    max_depth: int = 0,
    include: dict | None = None,
    exclude: dict | None = None,
) -> DataFrame:
    """The entries a reference traversal would yield: (path, name,
    is_dir, level). File rows keep their url in `path`."""
    assert mode in MODES, mode
    perm = _PERMS[mode]

    dirs = dir_rows(docs).withColumn(
        "hidden", F.startswith(F.col("name"), F.lit("."))
    )
    dirs = dirs.withColumn(
        "matched", _dir_matched(F.col("name"), F.col("path"), include, exclude)
    ).withColumn("perm", perm(F.col("matched"), F.col("hidden")))

    # chain(d) = AND of perm over PROPER ancestors (level-1 dirs have none)
    alevels = F.when(
        F.col("level") >= 2, F.sequence(F.lit(1), F.col("level") - 1)
    ).otherwise(F.array().cast("array<int>"))
    anc = dirs.select(
        F.col("path").alias("node"),
        F.explode(alevels).alias("alevel"),
        F.split("path", "/").alias("segs"),
    ).select(
        "node",
        F.array_join(F.slice("segs", 1, F.col("alevel") + 1), "/").alias("apath"),
    )
    aperm = dirs.select(F.col("path").alias("apath"), "perm")
    chains = (
        anc.join(aperm, "apath")
        .groupBy("node")
        .agg(F.min("perm").alias("chain"))
    )
    dirs = dirs.join(
        chains, dirs.path == chains.node, "left"
    ).withColumn("chain", F.coalesce("chain", F.lit(True))).drop("node")

    # files: chain(file) = chain(parent) && perm(parent)
    segs = _tree_segments(F.col("url"))
    files = docs.select(
        F.col("url").alias("path"),
        F.element_at(segs, -1).alias("name"),
        F.array_join(F.slice(segs, 1, F.size(segs) - 1), "/").alias("parent"),
        (F.size(segs) - 1).alias("level"),
        _file_matched(segs, include, exclude).alias("matched"),
    )
    parents = dirs.select(
        F.col("path").alias("parent"),
        (F.col("chain") & F.col("perm")).alias("pchain"),
    )
    files = files.join(parents, "parent", "left").withColumn(
        "pchain", F.coalesce("pchain", F.lit(True))  # level-1 files: root parent
    )

    depth_ok = (
        F.lit(True) if max_depth == 0 else (F.col("level") <= F.lit(max_depth))
    )
    files_out = files.filter(F.col("matched") & F.col("pchain") & depth_ok).select(
        "path", "name", F.lit(False).alias("is_dir"), "level"
    )
    if mode == "files":
        return files_out

    dir_yield = F.col("matched") & F.col("chain") & depth_ok
    if mode == "content_over_dirs":
        # dirs appear only AT the max depth (unlimited depth -> never)
        dir_yield = dir_yield & (
            F.lit(False) if max_depth == 0 else (F.col("level") == F.lit(max_depth))
        )
    dirs_out = dirs.filter(dir_yield).select(
        "path", "name", F.lit(True).alias("is_dir"), "level"
    )
    return files_out.unionByName(dirs_out)


def validate_roots(paths: list[str]) -> tuple[list[str], int]:
    """S4 input validation (input.rs:63-99): sort, drop exact duplicates;
    returns (roots, n_duplicates_dropped). Existence/is-dir checks are
    filesystem concerns the table analog has no equivalent for — a root
    here is a url prefix, always 'valid'."""
    uniq = sorted(set(paths if paths else ["."]))
    return uniq, len(paths or ["."]) - len(uniq)
