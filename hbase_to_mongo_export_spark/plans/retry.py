"""Retry-with-exponential-backoff for external calls.

Mirrors the reference's ``@Retryable`` policy applied to every external
service (DKS/S3/SQS/SNS/DynamoDB/manifest writes): 5 attempts, 1000 ms
initial delay, x2 backoff (reference ``HttpKeyService.kt:37-40``,
``SQSMessagingService.kt:16-19``, ``SnsServiceImpl.kt:18-21``,
``DynamoDBExportStatusService.kt:26-29``).

Only DRIVER-side calls go through this: executor-side work relies on
Spark task retry (deterministic re-execution), which is the correct
retry layer for distributed work — wrapping executor code in its own
sleep-retry loop would serialize failures instead of rescheduling them.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, TypeVar

T = TypeVar("T")


class RetriesExhausted(RuntimeError):
    def __init__(self, attempts: int, last: BaseException):
        super().__init__(f"gave up after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


def retryable(
    max_attempts: int = 5,
    initial_delay_ms: int = 1000,
    multiplier: float = 2.0,
    retry_on: tuple[type[BaseException], ...] = (Exception,),
    sleep: Callable[[float], None] = time.sleep,
) -> Callable[[Callable[..., T]], Callable[..., T]]:
    """Decorator: retry the wrapped callable on ``retry_on`` exceptions
    with exponential backoff (delays: d, d*m, d*m^2, ...). ``sleep`` is
    injectable so tests assert the backoff schedule without waiting."""

    def deco(fn: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(fn)
        def wrapper(*args, **kwargs) -> T:
            delay = initial_delay_ms / 1000.0
            last: BaseException | None = None
            for attempt in range(1, max_attempts + 1):
                try:
                    return fn(*args, **kwargs)
                except retry_on as e:
                    last = e
                    if attempt == max_attempts:
                        raise RetriesExhausted(max_attempts, e) from e
                    sleep(delay)
                    delay *= multiplier
            raise AssertionError("unreachable")

        return wrapper

    return deco
