"""Rebuild: normalize collection names, elect representatives, regenerate
sequences. SURVEY.md §2.5 A6 + §2.6 W1-W3.

Semantics from /root/reference/src/commands/rebuild.rs:
  - per row: (canonical, seq, comment, ext) from the collection grammar;
    starting new_name = case_fn(trim(canonical))  (rebuild.rs:234-250)
  - optional migration of old-style `name-9` stems  (rebuild.rs:77-100)
  - naming rules applied; cleared names are blocked  (rebuild.rs:102-103)
  - force mode overrides every name  (rebuild.rs:106-110)
  - smart-match group key strips [\\s_]+  (rebuild.rs:113-121)
  - order within group: (partial ? seq (null last) : 0), created, seq
    (rebuild.rs:123-132)
  - representative name: simple -> the common name; case -> most
    uppercase chars; default -> longest; ties resolved to the LAST
    maximum in sort order (Rust max_by_key semantics, rebuild.rs:135-155)
  - sequences: full mode renumbers 1..n; partial keeps existing seqs and
    continues after the last  (rebuild.rs:156-172)
  - output name `{base}~{seq}{comment}[.{ext}]`; keep changed rows only

All window/aggregate work is builtin (no UDFs); every window pins url as
the final tiebreak for reproducibility (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .naming import apply_naming
from .scan import collection_parts, old_style_parts


def _uppercase_count(col):
    # count of uppercase chars = length minus length after removing them
    return F.length(col) - F.length(F.regexp_replace(col, r"[A-Z\p{Lu}]", ""))


def rebuild_plan(
    df: DataFrame,
    rules: list[tuple[str, str]] | None = None,
    simple: bool = False,
    case: bool = False,
    partial: bool = False,
    force: str | None = None,
    migrate: bool = False,
) -> DataFrame:
    """Compute the rename plan. `df` needs (url, name, stem, ext, warc_ts).

    Returns (url, name, new_name, group_name, new_seq, changed, blocked).
    """
    parts = collection_parts(F.col("stem"))
    base = df.withColumn("_cp", parts).select(
        "*",
        F.col("_cp.canonical").alias("_canonical"),
        F.col("_cp.seq").alias("_seq"),
        F.col("_cp.comment").alias("_comment"),
    ).drop("_cp")

    case_fn = (lambda c: c) if case else F.lower
    base = base.withColumn("new_name", case_fn(F.trim(F.col("_canonical"))))

    if migrate:
        old = old_style_parts(F.col("stem"))
        base = base.withColumn(
            "new_name",
            F.when(
                F.col("_seq").isNull() & old["is_old_style"],
                case_fn(F.trim(old["base"])),
            ).otherwise(F.col("new_name")),
        ).withColumn(
            "_seq",
            F.when(
                F.col("_seq").isNull() & old["is_old_style"], old["seq"]
            ).otherwise(F.col("_seq")),
        )

    base = apply_naming(base, rules or [])
    plan = base.filter(~F.col("blocked"))
    blocked = base.filter(F.col("blocked"))

    if force is not None:
        plan = plan.withColumn("new_name", F.lit(force))

    if simple:
        plan = plan.withColumn("group_name", F.col("new_name"))
    else:
        plan = plan.withColumn(
            "group_name", F.regexp_replace("new_name", r"[\s_]+", "")
        )

    # W1: deterministic intra-group ordering (url pins ties)
    partial_seq = (
        F.coalesce(F.col("_seq"), F.lit(2**62)) if partial else F.lit(0)
    )
    order = [partial_seq, F.col("warc_ts"), F.col("_seq").asc_nulls_last(), F.col("url")]
    wg = W.partitionBy("group_name")
    wo = wg.orderBy(*order)
    plan = plan.withColumn("_pos", F.row_number().over(wo))

    # W3: representative-name election
    if simple:
        rep = F.first("new_name").over(wo.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    elif case:
        rep = F.max_by(
            F.col("new_name"), F.struct(_uppercase_count(F.col("new_name")), F.col("_pos"))
        ).over(wg)
    else:
        rep = F.max_by(
            F.col("new_name"), F.struct(F.length("new_name"), F.col("_pos"))
        ).over(wg)
    plan = plan.withColumn("_base", rep)

    # W2: sequence regeneration
    if partial:
        max_seq = F.coalesce(F.max("_seq").over(wg), F.lit(0))
        w_unseq = W.partitionBy("group_name", F.col("_seq").isNull()).orderBy(*order)
        unseq_rank = F.row_number().over(w_unseq)
        new_seq = F.when(F.col("_seq").isNotNull(), F.col("_seq")).otherwise(
            max_seq + unseq_rank
        )
    else:
        new_seq = F.col("_pos")
    plan = plan.withColumn("new_seq", new_seq.cast("long"))

    dot = F.when(F.col("ext") == "", F.lit("")).otherwise(F.lit("."))
    final_name = F.concat(
        F.col("_base"), F.lit("~"), F.col("new_seq").cast("string"),
        F.col("_comment"), dot, F.col("ext"),
    )
    plan = plan.withColumn("new_name", final_name).withColumn(
        "changed", F.col("new_name") != F.col("name")
    )

    out_cols = ["url", "name", "new_name", "group_name", "new_seq", "changed", "blocked"]
    return plan.select(*out_cols).unionByName(
        blocked.withColumn("group_name", F.lit(None).cast("string"))
        .withColumn("new_seq", F.lit(None).cast("long"))
        .withColumn("changed", F.lit(False))
        .select(*out_cols)
    )
