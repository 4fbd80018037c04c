"""Candidate-pair generation: LSH banding + inverted-token blocking.

SURVEY.md §2.4 J1/J2/O6. The reference builds an inverted token index and
emits all (i<j) pairs per posting list with a global seen-set
(/root/reference/src/commands/dupes.rs:177-184,218-245); the Spark-first
equivalent is: explode blocking keys -> group rows per key -> emit unique
combinations -> global dropDuplicates. LSH banding is the same shape with
key = xxhash64(signature band slice).

Scale notes (explicitly handled, north rule):
  - pair generation is ONE shuffle (groupBy key) instead of a two-sided
    self-join; partial aggregation combines map-side.
  - hot keys (stopword-like tokens / degenerate bands) produce B^2 pairs;
    keys above `cap` are dropped AND counted to a side-channel metric,
    mirroring the reference's stopword removal rationale.
  - the pair stream is deduped on (least, greatest) BEFORE any expensive
    scoring (barrier placement, SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .config import DedupConfig, DEFAULT


def _pairs_from_buckets(
    keyed: DataFrame, id_col: str, key_cols: list[str], cap: int,
    assume_unique: bool = False,
) -> DataFrame:
    """Group rows by blocking key and emit unique (src < dst) pairs.

    assume_unique=True skips the (key, id) dropDuplicates — a full extra
    exchange of the banded frame — for callers whose rows are unique by
    construction (np.unique'd winnow fingerprints, one-row-per-(id, band)
    explodes, array_distinct'd tokens). The bucket-size counts that gate
    the hot/cold cap split assume uniqueness, so only such callers may
    set it.

    Buckets larger than `cap` are truncated deterministically (the cap
    SMALLEST ids) and flagged via the `capped` column so callers can log
    dropped volume.

    The cap is enforced BEFORE any unbounded aggregation buffer exists
    (the collect_set-then-slice of rounds 1-2 built the FULL set per
    bucket inside the aggregation buffer first — observed JVM heap
    exhaustion at 800k docs, where 60-bit fingerprints band into a
    2^15-value key space and skewed buckets reach 10^5 members).

    Hot/cold split: bucket sizes are counted first (tiny count-agg
    buffers), over-cap keys — rare by construction — are broadcast;
    cold rows keep the fast hash-agg collect path with buffers bounded
    at `cap` elements by the size precondition, while only hot-bucket
    rows pay a window sort (WindowExec spills; hash-agg buffers don't).
    The common path therefore costs one count-agg + one collect-agg
    with no global sort."""
    from pyspark.sql import Window as W

    uniq = keyed.select(*key_cols, id_col)
    if not assume_unique:
        uniq = uniq.dropDuplicates([*key_cols, id_col])
    sizes = uniq.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_total"))
    hot_keys = sizes.filter(F.col("_total") > cap)

    cold = uniq.join(F.broadcast(hot_keys.select(*key_cols)), key_cols, "left_anti")
    cold_buckets = (
        cold.groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .filter(F.size("ids") > 1)
        .withColumn("capped", F.lit(False))
    )

    hot = uniq.join(F.broadcast(hot_keys.select(*key_cols)), key_cols, "left_semi")
    w = W.partitionBy(*key_cols).orderBy(id_col)
    hot_buckets = (
        hot.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)  # the cap SMALLEST ids, pre-aggregation
        .groupBy(*key_cols)
        .agg(F.sort_array(F.collect_list(F.col(id_col))).alias("ids"))
        .withColumn("capped", F.lit(True))
    )
    buckets = cold_buckets.unionByName(hot_buckets)
    # all i<j combinations, generated JVM-side with higher-order functions
    # (bucket sizes are cap-bounded, so per-row explode cost is bounded;
    # profiling showed an extra repartition here costs more than the
    # skew it would spread)
    pairs = buckets.select(
        F.col("capped"),
        F.explode(
            F.flatten(
                F.transform(
                    F.col("ids"),
                    lambda x, i: F.transform(
                        F.slice(
                            F.col("ids"),
                            i + F.lit(2),
                            F.greatest(F.size("ids") - i - 1, F.lit(0)),
                        ),
                        lambda y: F.struct(x.alias("src"), y.alias("dst")),
                    ),
                )
            )
        ).alias("p"),
    )
    return pairs.select("p.src", "p.dst", "capped")


def bucket_cap_stats(
    keyed: DataFrame, id_col: str, key_cols: list[str], cap: int
) -> DataFrame:
    """One-row accounting of what the band cap silently drops: over the
    same bucket frame _pairs_from_buckets consumes, count multi-member
    buckets, capped buckets, and the exact pair shortfall
    C(n,2) - C(cap,2) per capped bucket. A silent cap at scale reads as
    full coverage — pipeline passes log this row to StageRunner metrics
    (round-2 verdict item 10)."""
    sizes = (
        keyed.groupBy(*key_cols)
        .agg(F.count_distinct(F.col(id_col)).alias("n"))
        .filter(F.col("n") > 1)
    )
    capl = F.lit(cap)
    return sizes.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.coalesce(F.sum((F.col("n") > cap).cast("long")), F.lit(0)).alias(
            "n_capped"
        ),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("n") > cap,
                    (F.col("n") * (F.col("n") - 1) - capl * (capl - 1)) / 2,
                ).otherwise(0.0)
            ).cast("long"),
            F.lit(0),
        ).alias("est_dropped_pairs"),
    )


def count_and_est_bytes(
    df: DataFrame, per_row_overhead: int = 48
) -> tuple[int, int]:
    """Row count + estimated materialized byte size of `df`, in ONE Spark
    job (a single agg — no separate limit().collect() sampling pass).

    String/binary columns cost their exact average length; every other
    column a fixed 8 bytes (the int64 id hot path; arrays never flow
    through the frames gated here). Driver fast paths and broadcast
    hints must gate on BYTES, not rows — 2M edges of ~134-char urls
    serialize past 1 GB long before any row cap (CLAUDE.md)."""
    width = F.lit(0)
    for c, t in df.dtypes:
        if t in ("string", "binary"):
            width = width + F.coalesce(F.length(F.col(c)), F.lit(0))
        else:
            width = width + F.lit(8)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.avg(width), F.lit(0.0)).alias("w"),
    ).first()
    n = int(row["n"])
    return n, int((row["w"] + per_row_overhead) * n)


def materialize_pairs(
    pairs: DataFrame,
    broadcast_max_rows: int = 4_000_000,
    broadcast_max_bytes: int = 256 * 1024 * 1024,
) -> tuple[DataFrame, int]:
    """Materialize a candidate-pair frame (it always feeds TWO payload
    attach joins) and broadcast-hint it when small.

    Why: the verify joins attach fat per-doc payloads (signature arrays,
    texts, token-weight arrays) to each pair side. Planned statically,
    Catalyst sees unknown sizes and picks sort-merge — the payload side
    pays a full shuffle WRITE even when AQE later converts the join
    (conversion reuses the already-staged shuffle). An explicit
    broadcast of the byte-small pair side keeps the first payload attach
    entirely map-side: the payload table is scanned, never shuffled.

    The hint is withheld above EITHER cap: the row cap (pairs scale with
    corpus at 10^12 docs) or the byte cap — on the int64 doc_id hot path
    4M pairs are ~128 MB, but standalone callers pair url strings, where
    the same 4M rows exceed 1 GB collected (driver.maxResultSize); both
    estimates come from the same single-job agg as the count. Above the
    caps the join stays sort-merge — the distributed path.
    Returns (frame, n_pairs)."""
    pairs = pairs.localCheckpoint(eager=True)
    # 16-byte per-row overhead: the broadcast relation's compact row
    # framing, not the fatter driver-collect Row overhead (that gate
    # lives in cluster.py with the default 48)
    n, est = count_and_est_bytes(pairs, per_row_overhead=16)
    hint = n <= broadcast_max_rows and est <= broadcast_max_bytes
    return (F.broadcast(pairs) if hint else pairs), n


def lsh_band_keys(
    df: DataFrame,
    cfg: DedupConfig = DEFAULT,
    sig_col: str = "minhash",
    id_col: str = "url",
) -> DataFrame:
    """Explode the MinHash signature into (band, band_key) rows, JVM-side.

    `id_col` is the row identity carried through banding — the pipeline
    passes the int64 `doc_id` so the band shuffle moves 8-byte ids
    instead of full url strings (the measured bandwidth ceiling on
    shuffle-bound stages is partly payload-width; see pipeline.prepare)."""
    r = cfg.lsh_rows
    banded = df.select(
        id_col,
        sig_col,
        F.explode(F.sequence(F.lit(0), F.lit(cfg.lsh_bands - 1))).alias("band"),
    ).withColumn(
        "band_key",
        F.xxhash64(F.col("band"), F.slice(F.col(sig_col), F.col("band") * r + 1, r)),
    )
    return banded.select(id_col, "band", "band_key")


def lsh_candidates(
    docs_with_sig: DataFrame, cfg: DedupConfig = DEFAULT, id_col: str = "url"
) -> DataFrame:
    """Unique candidate id pairs from LSH band collisions."""
    banded = lsh_band_keys(docs_with_sig.select(id_col, "minhash"), cfg, id_col=id_col)
    pairs = _pairs_from_buckets(
        banded, id_col, ["band", "band_key"], cfg.band_cap,
        assume_unique=True,  # one row per (id, band) by construction
    )
    return pairs.select("src", "dst").dropDuplicates(["src", "dst"])


def lsh_cap_stats(
    docs_with_sig: DataFrame, cfg: DedupConfig = DEFAULT, id_col: str = "url"
) -> DataFrame:
    """Cap accounting for the MinHash-LSH band join (one-row DF)."""
    banded = lsh_band_keys(docs_with_sig.select(id_col, "minhash"), cfg, id_col=id_col)
    return bucket_cap_stats(banded, id_col, ["band", "band_key"], cfg.band_cap)


def prefix_block_candidates(
    named: DataFrame, cfg: DedupConfig = DEFAULT
) -> DataFrame:
    """Weighted prefix-filtered candidate generation for the name pass —
    EXACT w.r.t. the final edge set, unlike a df-cap.

    Any pair the scorer can accept satisfies
        rare >= bound = (threshold - string_weight) / rare_token_weight
    (sim = max(lev, dice)*sw + rare*rw with max(...) <= 1), and
    rare <= inter_score / min(wsum), so the shared-token weight must be
    >= bound * min(wsum_a, wsum_b). Hence the smaller side must share a
    token inside its weighted PREFIX — its heaviest (rarest) tokens up
    to the point where the remaining tail weighs < bound * wsum. The
    join probes each doc's prefix tokens against the FULL inverted
    index: a hot (stopword-like) token has near-zero weight, so it
    almost never sits in any prefix and its posting list is never
    self-joined — the O(df^2) hot-token blow-up disappears without
    dropping a single qualifying pair.

    Plan: explode distinct tokens -> freq join -> per-url running-sum
    window (weight desc) marks the prefix -> prefix rows join the full
    index on token -> (least, greatest) dedup. Two narrow shuffles.
    """
    from pyspark.sql import Window as W

    bound = (cfg.threshold - cfg.string_weight) / cfg.rare_token_weight
    tok = named.select("url", F.explode(F.array_distinct("tokens")).alias("token"))
    freq = (
        named.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = tok.join(freq, "token").select(
        "url", "token", (F.lit(1.0) / F.log1p("freq")).alias("w")
    )
    wu = W.partitionBy("url")
    wcum = wu.orderBy(F.desc("w"), "token").rowsBetween(W.unboundedPreceding, 0)
    flagged = (
        w.withColumn("wsum", F.sum("w").over(wu))
        .withColumn("cum", F.sum("w").over(wcum))
        .withColumn(
            "in_prefix",
            (F.col("cum") - F.col("w")) <= (1.0 - bound) * F.col("wsum"),
        )
    )
    probe = flagged.filter("in_prefix").select(F.col("url").alias("pu"), "token")
    index = flagged.select(F.col("url").alias("iu"), "token")
    return (
        probe.join(index, "token")
        .filter(F.col("pu") != F.col("iu"))
        .select(
            F.least("pu", "iu").alias("src"), F.greatest("pu", "iu").alias("dst")
        )
        .dropDuplicates(["src", "dst"])
    )


def token_block_candidates(
    named: DataFrame, cfg: DedupConfig = DEFAULT
) -> DataFrame:
    """Reference-parity inverted-token blocking (dupes.rs:177-184).

    Input needs (url, tokens). Tokens with document frequency above
    `token_block_df_cap` are excluded from *blocking* (scale guard — they
    still participate in scoring), then pairs are generated per token
    bucket and globally deduped.
    """
    tok = named.select("url", F.explode(F.array_distinct("tokens")).alias("token"))
    # df-cap hot tokens: two-stage agg (map-side combine handles skew)
    hot = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > cfg.token_block_df_cap)
        .select("token")
    )
    cold = tok.join(F.broadcast(hot), "token", "left_anti")
    pairs = _pairs_from_buckets(
        cold, "url", ["token"], cfg.band_cap,
        assume_unique=True,  # array_distinct upstream: unique (url, token)
    )
    return pairs.select("src", "dst").dropDuplicates(["src", "dst"])
