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


def probe_one(
    name: str,
    prober: Callable[[str], int],
    retries: int = 2,
    min_wait_ms: int = 1000,
    backoff: float = 2.0,
    max_wait_ms: int = 30_000,
    sleeper: Callable[[float], None] | None = None,
) -> Verdict:
    """Reference retry loop (probe.rs:161-202): 200/403 -> valid,
    404 -> invalid; anything else (429, other statuses, transport
    errors) retries after an exponential wait
    wait = min(wait * backoff, max_wait), failing once retry > retries
    (retries < 0 retries indefinitely). `sleeper` is injected so tests
    pin the schedule without real sleeps."""
    return probe_one_trace(
        name, prober, retries, min_wait_ms, backoff, max_wait_ms, sleeper
    )[0]


def probe_one_trace(
    name: str,
    prober: Callable[[str], int],
    retries: int = 2,
    min_wait_ms: int = 1000,
    backoff: float = 2.0,
    max_wait_ms: int = 30_000,
    sleeper: Callable[[float], None] | None = None,
) -> tuple[Verdict, int, int]:
    """probe_one plus its observable trace: (verdict, n_attempts,
    waited_ms). n_attempts counts prober invocations (exceptions
    included); waited_ms sums the backoff schedule actually slept.
    The trace makes the probe.rs:161-206 state machine pure data, so a
    deterministic injected client turns it into a SQL-replayable oracle
    (round-3 verdict item 7)."""
    import time

    sleeper = sleeper or time.sleep
    wait = min_wait_ms
    retry = 0
    attempts = 0
    waited_ms = 0
    while True:
        attempts += 1
        try:
            status = prober(name)
        except Exception:
            status = None
        if status in (200, 403):
            return "valid", attempts, waited_ms
        if status == 404:
            return "invalid", attempts, waited_ms
        retry += 1
        if retries >= 0 and retry > retries:
            return "failed", attempts, waited_ms
        sleeper(wait / 1000.0)
        waited_ms += wait
        wait = min(int(wait * backoff), max_wait_ms)


def probe_names(
    names: DataFrame,
    prober: Callable[[str], int] | None = None,
    max_retries: int = 2,
    min_wait_ms: int = 1000,
    backoff: float = 2.0,
    max_wait_ms: int = 30_000,
    sleeper: Callable[[float], None] | None = None,
    trace: bool = False,
) -> DataFrame:
    """Attach a verdict per name. `prober(name) -> HTTP status code`
    (may raise; raises retry with exponential backoff, probe.rs:190-202).
    Each partition probes its names sequentially, so cluster-wide request
    concurrency == partition count — the scale knob. trace=True adds the
    (n_attempts, waited_ms) retry-loop observables per name."""
    if prober is None:
        raise ValueError(
            "no prober injected: this sandbox has no network; pass a callable"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            traces = [
                probe_one_trace(
                    name, prober, max_retries, min_wait_ms, backoff,
                    max_wait_ms, sleeper,
                )
                for name in pdf["name"]
            ]
            out = {"name": pdf["name"], "verdict": [t[0] for t in traces]}
            if trace:
                out["n_attempts"] = pd.array(
                    [t[1] for t in traces], dtype="int64"
                )
                out["waited_ms"] = pd.array(
                    [t[2] for t in traces], dtype="int64"
                )
            yield pd.DataFrame(out)

    ddl = "name string, verdict string"
    if trace:
        ddl += ", n_attempts long, waited_ms long"
    return names.mapInPandas(run, ddl)
