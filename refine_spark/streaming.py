"""Incremental / streaming ingestion for the dedup pipeline.

The reference is strictly batch (SURVEY.md §2.9) — its ctrl-c partial
results map to checkpoint/resume, not streams. This module is the
extension a production crawl pipeline needs: documents arrive
continuously and must dedup against the already-indexed corpus without
recomputing it.

Design (Structured Streaming, foreachBatch):
  - the corpus index is two compact tables: (sample_key -> rep url) for
    exact dups and (band, band_key -> rep url) for MinHash/LSH — both
    partitioned by key, so each micro-batch joins against only the
    matching partitions.
  - each micro-batch: compute the batch's sample hashes + signatures
    (same kernels as batch mode), join the indexes, emit assignments for
    matched docs, and append the unmatched docs' keys to the indexes.
  - watermarking/state: matching is pure join-on-key, so no
    applyInPandasWithState is required; dedup state lives in the index
    tables (restart-safe, exactly the pipeline's checkpoint story).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .config import DedupConfig, DEFAULT
from .exact import three_point_sample, with_size_kind
from .candidates import lsh_band_keys
from .signatures import with_signatures


def exact_index(docs: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(sample_key, rep) index: one representative url per exact-content key."""
    keyed = with_size_kind(docs).withColumn(
        "sample_key",
        F.concat_ws(
            "|",
            F.col("size"),
            F.col("kind"),
            F.sha2(three_point_sample(F.col("html"), cfg.sample_kb * 1024), 256),
        ),
    )
    return keyed.groupBy("sample_key").agg(F.min("url").alias("rep"))


def lsh_index(docs: DataFrame, cfg: DedupConfig = DEFAULT) -> DataFrame:
    """(band, band_key, rep) index over MinHash bands."""
    signed = with_signatures(docs.select("url", "text"), cfg)
    banded = lsh_band_keys(signed, cfg)
    return banded.groupBy("band", "band_key").agg(F.min("url").alias("rep"))


def match_batch(
    batch: DataFrame,
    exact_idx: DataFrame,
    lsh_idx: DataFrame,
    cfg: DedupConfig = DEFAULT,
) -> DataFrame:
    """Assign each incoming doc to an existing representative if any index
    matches; null rep = novel document. Exact match wins over LSH."""
    keyed = with_size_kind(batch).withColumn(
        "sample_key",
        F.concat_ws(
            "|",
            F.col("size"),
            F.col("kind"),
            F.sha2(three_point_sample(F.col("html"), cfg.sample_kb * 1024), 256),
        ),
    )
    e = keyed.join(
        exact_idx.withColumnRenamed("rep", "exact_rep"), "sample_key", "left"
    )
    signed = with_signatures(e.select("url", "text"), cfg)
    banded = lsh_band_keys(signed, cfg)
    lsh_match = (
        banded.join(lsh_idx.withColumnRenamed("rep", "lsh_rep"), ["band", "band_key"])
        .groupBy("url")
        .agg(F.min("lsh_rep").alias("lsh_rep"))
    )
    return (
        e.select("url", "exact_rep")
        .join(lsh_match, "url", "left")
        .withColumn("rep", F.coalesce("exact_rep", "lsh_rep"))
        .select("url", "rep")
    )


INDEX_BUCKETS = 16  # key-hash partition fan-out of the state tables


def _bucketed(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Attach the key-hash bucket partition column."""
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(*key_cols), F.lit(INDEX_BUCKETS)).cast("int")
    )


def recover_compaction(path: str) -> list[int]:
    """Repair a compaction interrupted mid-swap (crash between the two
    os.rename calls): a leftover `_compact_prev_{id}` whose `bucket=` dir
    is missing holds the ONLY copy of that bucket's rows — partition
    discovery ignores `_`-prefixed paths, so without this repair the
    bucket silently vanishes from reads. Restores such backups, deletes
    backups whose bucket dir exists (crash after the swap, before
    cleanup), and drops incomplete `_compact_staging_` writes. Returns
    the restored bucket ids. Idempotent; called on every compact_index
    entry and safe to call at stream start."""
    import shutil

    restored: list[int] = []
    if not os.path.exists(path):
        return restored
    for entry in sorted(os.listdir(path)):
        full = os.path.join(path, entry)
        if entry.startswith("_compact_prev_"):
            bucket_id = entry[len("_compact_prev_"):]
            bdir = os.path.join(path, f"bucket={bucket_id}")
            if os.path.exists(bdir):
                shutil.rmtree(full)  # swap completed; backup is stale
            else:
                os.rename(full, bdir)  # swap died mid-way; restore live dir
                restored.append(int(bucket_id))
        elif entry.startswith("_compact_staging_"):
            shutil.rmtree(full)  # incomplete staging write; source intact
    return restored


def compact_index(
    spark: SparkSession, path: str, max_files_per_bucket: int = 4
) -> list[int]:
    """Partition-scoped compaction: rewrite ONLY bucket directories that
    accumulated more than `max_files_per_bucket` parquet files; clean
    buckets are untouched. Write volume is O(dirty-bucket rows), never
    O(corpus) — round-2's whole-index rewrite became a corpus-scale job
    at 10^12 keys (Iceberg's binpack-by-partition compaction analog).
    Returns the compacted bucket ids."""
    import shutil

    compacted: list[int] = []
    if not os.path.exists(path):
        return compacted
    recover_compaction(path)
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("bucket="):
            continue
        bdir = os.path.join(path, entry)
        n_files = sum(
            1 for f in os.listdir(bdir)
            if f.endswith(".parquet") and not f.startswith(".")
        )
        if n_files <= max_files_per_bucket:
            continue
        bucket_id = int(entry.split("=", 1)[1])
        # snapshot swap with '_'-prefixed scratch names: Spark's partition
        # discovery ignores _-prefixed paths, so a crash mid-swap never
        # corrupts table reads (atomic_overwrite's `<dir>.prev` naming
        # would parse as a bogus partition value here)
        staging = os.path.join(path, f"_compact_staging_{bucket_id}")
        backup = os.path.join(path, f"_compact_prev_{bucket_id}")
        spark.read.parquet(bdir).coalesce(1).write.mode("overwrite").parquet(staging)
        if os.path.exists(backup):
            shutil.rmtree(backup)
        os.rename(bdir, backup)
        os.rename(staging, bdir)
        shutil.rmtree(backup)
        compacted.append(bucket_id)
    return compacted


def run_incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    cfg: DedupConfig = DEFAULT,
    schema=None,
    compact_every: int = 16,
    max_files_per_bucket: int = 4,
):
    """readStream over a parquet drop directory; per micro-batch match +
    index update via foreachBatch. Returns the StreamingQuery.

    State tables live under state_dir/{exact,lsh}, hash-partitioned into
    INDEX_BUCKETS `bucket=` directories; the streaming checkpoint under
    state_dir/_checkpoint makes restarts exactly-once.

    Scale contract (round-2 fix): each micro-batch APPENDS only the
    batch's novel keys — per-batch write volume is O(batch), never
    O(corpus). Appending only keys absent from the current index keeps
    each key unique (foreachBatch batches are serial), so reads need no
    dedup. Every `compact_every` batches, compact_index rewrites ONLY the
    buckets whose small-file count exceeded max_files_per_bucket
    (round-3: partition-scoped, no more full-index rewrites)."""
    from . import schema as schemas

    schema = schema or schemas.DOCUMENTS
    exact_path = os.path.join(state_dir, "exact")
    lsh_path = os.path.join(state_dir, "lsh")
    out_path = os.path.join(state_dir, "assignments")
    for p in (exact_path, lsh_path):  # heal any compaction killed mid-swap
        recover_compaction(p)

    def _load(path: str, ddl: str) -> DataFrame:
        if os.path.exists(path):
            return spark.read.parquet(path)
        return spark.createDataFrame([], ddl)

    def process(batch: DataFrame, batch_id: int) -> None:
        batch = batch.dropDuplicates(["url"]).localCheckpoint(eager=True)
        exact_idx = _load(exact_path, "sample_key string, rep string")
        lsh_idx = _load(lsh_path, "band int, band_key long, rep string")
        matched = match_batch(batch, exact_idx, lsh_idx, cfg).localCheckpoint(
            eager=True
        )
        matched.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )
        novel = batch.join(
            matched.filter(F.col("rep").isNotNull()).select("url"), "url", "left_anti"
        ).localCheckpoint(eager=True)
        if not novel.isEmpty():
            # append ONLY keys the index does not already hold: O(batch),
            # hash-partitioned so compaction can stay bucket-scoped
            _bucketed(
                exact_index(novel, cfg).join(exact_idx, "sample_key", "left_anti"),
                ["sample_key"],
            ).write.mode("append").partitionBy("bucket").parquet(exact_path)
            _bucketed(
                lsh_index(novel, cfg).join(
                    lsh_idx, ["band", "band_key"], "left_anti"
                ),
                ["band", "band_key"],
            ).write.mode("append").partitionBy("bucket").parquet(lsh_path)
        if batch_id > 0 and batch_id % compact_every == 0:
            for p in (exact_path, lsh_path):
                compact_index(spark, p, max_files_per_bucket)

    stream = (
        spark.readStream.schema(schema)
        .parquet(input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(state_dir, "_checkpoint"))
        .trigger(availableNow=True)
    )
    return stream.start()
