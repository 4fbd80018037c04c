"""Probe: validate deduped names against an external service.

SURVEY.md §2.1 S8 + §2.5 A11 + §2.2 P9. Reference semantics
(/root/reference/src/commands/probe.rs):
  - names deduped after collection-grammar sequence stripping
    (probe.rs:105-107)
  - optional pick-regex subset filter (probe.rs:109-117)
  - per-name HEAD request with retry/backoff: HTTP 200/403 -> valid,
    404 -> invalid, other/errors retried up to a budget -> failed
    (probe.rs:161-206)

Spark-first: dedup+filter are builtins; the external effect runs in
`mapInPandas` so each partition batches its own requests with bounded
concurrency — an external-effect operator kept off the analytics hot
path. The HTTP client is injected so tests (and this sandbox, which has
no network) use a deterministic fake; the real client would use
urllib/requests per partition.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .scan import collection_parts

Verdict = str  # 'valid' | 'invalid' | 'failed'


def deduped_names(df: DataFrame, pick: str | None = None) -> DataFrame:
    """Distinct canonical names (sequence stripped), optional pick filter."""
    names = df.select(
        collection_parts(F.col("stem"))["canonical"].alias("name")
    ).dropDuplicates(["name"])
    if pick:
        names = names.filter(F.col("name").rlike(pick))
    return names


def probe_names(
    names: DataFrame,
    prober: Callable[[str], int] | None = None,
    max_retries: int = 2,
) -> DataFrame:
    """Attach a verdict per name. `prober(name) -> HTTP status code`
    (may raise; raises are retried then recorded as 'failed')."""
    if prober is None:
        raise ValueError(
            "no prober injected: this sandbox has no network; pass a callable"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            verdicts = []
            for name in pdf["name"]:
                verdict: Verdict = "failed"
                for _ in range(max_retries + 1):
                    try:
                        status = prober(name)
                    except Exception:
                        continue
                    if status in (200, 403):
                        verdict = "valid"
                        break
                    if status == 404:
                        verdict = "invalid"
                        break
                verdicts.append(verdict)
            yield pd.DataFrame({"name": pdf["name"], "verdict": verdicts})

    return names.mapInPandas(run, "name string, verdict string")
