"""Job metrics with pushgateway-style lifecycle.

The reference pushes Prometheus metrics to a pushgateway every 20 s
during the run, once at completion, then deletes the grouping key
(``PushGatewayServiceImpl.kt:20-41``). This module reproduces that
surface with a pluggable pusher: ``LocalPushGateway`` appends JSON lines
(one per push) for tests and local runs; a real PushGateway
implementation would POST the same payload.

Counter names follow the reference's metric registry so dashboards
transfer directly.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field


class MetricsRegistry:
    """Thread-safe counters/gauges for one export run."""

    def __init__(self, job: str, instance: str = "local"):
        self.job = job
        self.instance = instance
        self._lock = threading.Lock()
        self._values: dict[str, float] = {}

    def inc(self, name: str, amount: float = 1.0) -> None:
        with self._lock:
            self._values[name] = self._values.get(name, 0.0) + amount

    def set(self, name: str, value: float) -> None:
        with self._lock:
            self._values[name] = value

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self._values)


@dataclass
class LocalPushGateway:
    """File-backed pushgateway stand-in: one JSON line per push, a
    ``deleted`` marker on teardown (mirroring pushgateway DELETE)."""

    path: str
    pushes: int = field(default=0, init=False)

    def push(self, registry: MetricsRegistry, final: bool = False) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {
                        "job": registry.job,
                        "instance": registry.instance,
                        "final": final,
                        "metrics": registry.snapshot(),
                    }
                )
                + "\n"
            )
        self.pushes += 1

    def delete(self, registry: MetricsRegistry) -> None:
        with open(self.path, "a", encoding="utf-8") as fh:
            fh.write(
                json.dumps(
                    {"job": registry.job, "instance": registry.instance,
                     "deleted": True}
                )
                + "\n"
            )


class PeriodicPusher:
    """Background pusher: push every ``interval_s`` while running, one
    final push + delete on stop (PushGatewayServiceImpl.kt lifecycle)."""

    def __init__(
        self,
        registry: MetricsRegistry,
        gateway: LocalPushGateway,
        interval_s: float = 20.0,
    ):
        self.registry = registry
        self.gateway = gateway
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def __enter__(self) -> "PeriodicPusher":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            self.gateway.push(self.registry)

    def __exit__(self, *exc) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.gateway.push(self.registry, final=True)
        self.gateway.delete(self.registry)
