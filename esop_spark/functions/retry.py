"""Sink-side transfer retries (U3 exposed knob).

Spark already retries failed TASKS; the reference additionally retries
individual file transfers inside an attempt (--retry-enabled,
--retry-strategy linear|exponential, --retry-interval, --retry-max-attempts
— impl/retry/RetrySpec.java:17-55). Task-level retry re-runs a whole
partition of files, so for flaky object stores a per-file retry is the
cheaper first line of defense; this module reproduces the reference's
semantics exactly (Retrier.java:60-79):

- ``attempts`` counts FAILURES; the operation runs until the failure count
  exceeds ``max_attempts`` (so max_attempts=3 means up to 4 executions);
- only RETRIABLE errors are retried, anything else propagates immediately;
- linear sleeps a constant interval, exponential doubles per failure.

Used inside foreachPartition workers — plain Python, no Spark objects —
so the same spec works in every sink (upload, freshen re-upload,
restore download).
"""

from __future__ import annotations

import time
from dataclasses import dataclass


@dataclass
class RetrySpec:
    """Defaults mirror RetrySpec.java (interval 10 s, linear, 3 attempts,
    disabled unless opted in)."""

    interval: float = 10.0
    strategy: str = "linear"  # "linear" | "exponential"
    max_attempts: int = 3
    enabled: bool = False

    def __post_init__(self) -> None:
        if self.strategy not in ("linear", "exponential"):
            raise ValueError(f"unknown retry strategy: {self.strategy!r}")
        if self.interval < 1:
            self.interval = 10.0
        if self.max_attempts < 1:
            self.max_attempts = 3


def with_retries(
    fn,
    spec: RetrySpec | None,
    retriable: tuple[type[BaseException], ...] = (OSError,),
    sleep=time.sleep,
):
    """Run ``fn`` under the spec; returns its result. ``sleep`` is
    injectable so tests don't wait wall-clock seconds."""
    if spec is None or not spec.enabled:
        return fn()
    attempts = 0
    interval = spec.interval
    while True:
        try:
            return fn()
        except retriable:
            attempts += 1
            if attempts > spec.max_attempts:
                raise
            sleep(interval)
            if spec.strategy == "exponential":
                interval *= 2
