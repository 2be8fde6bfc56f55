"""Retry with exponential backoff + jitter, and a failed-batch retry queue.

Reference: ``/root/reference/source/error_handling.py:16-105`` (connection
errors 3×; lock timeouts 5×, 10 s base, 300 s cap, 10% jitter;
``config.py:44-50``) and the infrastructure-failure retry queue
(``pipeline_management.py:458-467``, ``:527-586``).

In Spark, task-level failures are already retried by the scheduler
(``spark.task.maxFailures``); this wraps *driver-level* batch applies —
the analog of the reference's per-table retry — where a failure mid-MERGE
is safe to re-run because commits are atomic and batch-id idempotent.
"""

from __future__ import annotations

import random
import time
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class RetryPolicy:
    max_attempts: int = 3
    base_delay_s: float = 1.0
    max_delay_s: float = 300.0
    jitter: float = 0.1
    retryable: tuple[type[BaseException], ...] = (Exception,)

    def delay(self, attempt: int) -> float:
        d = min(self.base_delay_s * (2**attempt), self.max_delay_s)
        return d * (1 + random.uniform(-self.jitter, self.jitter))


def with_retry(fn: Callable, policy: RetryPolicy | None = None, on_retry: Callable | None = None):
    policy = policy or RetryPolicy()
    last: BaseException | None = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except policy.retryable as e:  # noqa: PERF203
            last = e
            if attempt == policy.max_attempts - 1:
                break
            if on_retry:
                on_retry(attempt, e)
            time.sleep(policy.delay(attempt))
    raise last  # type: ignore[misc]


@dataclass
class RetryQueue:
    """Failed (table, batch) applies queued for a later cycle — safe
    because re-applying a committed batch is a no-op (exactly-once)."""

    items: list[tuple[str, str]] = field(default_factory=list)

    def push(self, table: str, batch_id: str) -> None:
        if (table, batch_id) not in self.items:
            self.items.append((table, batch_id))

    def drain(self) -> list[tuple[str, str]]:
        out, self.items = self.items, []
        return out
