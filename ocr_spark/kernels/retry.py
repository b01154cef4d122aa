"""Bounded per-record retry with deterministic exponential backoff.

This is the seam the reference's network call occupied
(scripts/ExtractX_OCR.py:366-430: ≤3 attempts on retryable statuses,
delay = 1·2^k + U(0,1) jitter, exhaustion → empty sentinel, never a job
failure). The rebuild's kernels are deterministic, so the retry loop is a
no-op for them — but the surface exists, bounded and in-UDF, for any
future flaky external stage (an OCR/LLM endpoint plugged into the same
dispatch), and its attempts are recorded in the per-partition lineage.

Differences from the reference, both deliberate:
- backoff is ``base·2^k`` with NO jitter — stage determinism is a driver
  contract (nothing in the output may depend on wall clock or randomness);
- the retryable signal is a typed exception (TransientKernelError), not an
  HTTP status list — the kernel decides what is transient.
"""

from __future__ import annotations

import time
from typing import Any, Callable


class TransientKernelError(Exception):
    """A per-record failure worth retrying (the analogue of the
    reference's retryable statuses 503/429/500/502/504)."""


def call_with_retry(
    fn: Callable[..., Any],
    *args: Any,
    attempts: int = 3,
    base_delay: float = 0.0,
    sleep: Callable[[float], None] = time.sleep,
) -> tuple[Any, int]:
    """Call ``fn(*args, attempt=k)`` for k = 0.., retrying on
    TransientKernelError up to ``attempts`` total attempts; returns
    (result, attempts_used). Before retry k (k ≥ 1) sleeps
    ``base_delay·2^(k-1)`` (skipped entirely when base_delay == 0 — local
    deterministic kernels never wait). Exhaustion re-raises the last
    TransientKernelError; the caller degrades to the empty sentinel, so a
    permanently failing record can never fail the partition."""
    last: TransientKernelError | None = None
    for k in range(max(1, attempts)):
        if k and base_delay:
            sleep(base_delay * (2 ** (k - 1)))
        try:
            return fn(*args, attempt=k), k + 1
        except TransientKernelError as e:
            last = e
    assert last is not None
    raise last
