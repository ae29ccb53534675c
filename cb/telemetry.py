"""Per-stage telemetry counters — the engine analog of the reference's
``ITelemetryProvider`` (every actor instrumented with PerfIt,
/root/reference/src/ConveyorBelt.Tooling/Telemetry/TelemetryProvider.cs:6-27).

Build-side observability already exists (``IndexMeta.build_metrics``,
read back from the build's manifests); this module is the QUERY-side
surface: each serving component owns a :class:`Telemetry`, stages wrap
their hot sections in :meth:`Telemetry.timer`, and snapshots are
additive-mergeable so a pool's per-actor counters roll up into one
engine view (``QueryEngine.metrics``).  At cluster scale this is how
you find the straggler: per-stage totals localize whether time went to
fan-out dispatch, server-side scoring/decode, the driver wait, or the
merge.

Overhead: one ``perf_counter`` pair and a dict update per stage —
negligible next to any scoring call; value reservoirs are bounded.
"""

from __future__ import annotations

import random
import time
from contextlib import contextmanager


class Telemetry:
    def __init__(self, keep_values: int = 100_000):
        # name -> [count, total_sec, max_sec]
        self._stats: dict[str, list[float]] = {}
        # bounded per-name reservoirs for percentiles — uniform over the
        # WHOLE stream (Vitter's Algorithm R), not the first keep_values
        # samples: a long-lived engine must not report warm-up-biased
        # percentiles once the reservoir fills
        self._values: dict[str, list[float]] = {}
        self._counters: dict[str, int] = {}
        self._keep = keep_values
        self._rng = random.Random(0x5EED)

    def record(self, name: str, seconds: float) -> None:
        s = self._stats.get(name)
        if s is None:
            self._stats[name] = [1, seconds, seconds]
            self._values[name] = [seconds]
            return
        s[0] += 1
        s[1] += seconds
        if seconds > s[2]:
            s[2] = seconds
        v = self._values[name]
        if len(v) < self._keep:
            v.append(seconds)
        else:
            j = self._rng.randrange(int(s[0]))
            if j < self._keep:
                v[j] = seconds

    def incr(self, name: str, n: int = 1) -> None:
        self._counters[name] = self._counters.get(name, 0) + n

    @contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def percentile(self, name: str, p: float) -> float:
        """p in [0, 1]; exact over the (bounded) recorded values."""
        v = sorted(self._values.get(name, ()))
        if not v:
            return 0.0
        return v[min(len(v) - 1, int(p * len(v)))]

    def snapshot(self) -> dict:
        out: dict = {"timers": {}, "counters": dict(self._counters)}
        for name, (count, total, mx) in self._stats.items():
            out["timers"][name] = {
                "count": int(count),
                "total_sec": total,
                "max_sec": mx,
                "mean_sec": total / count if count else 0.0,
                "p50_sec": self.percentile(name, 0.50),
                "p95_sec": self.percentile(name, 0.95),
            }
        return out


def merge_snapshots(snaps: list[dict]) -> dict:
    """Additive roll-up of :meth:`Telemetry.snapshot` dicts (a server
    pool's per-actor counters -> one engine view).  Percentiles don't
    merge exactly; the roll-up keeps count/total/max/mean and drops
    per-actor p50/p95 (read a single actor's snapshot for those)."""
    timers: dict[str, dict] = {}
    counters: dict[str, int] = {}
    for s in snaps:
        for name, t in s.get("timers", {}).items():
            m = timers.setdefault(
                name, {"count": 0, "total_sec": 0.0, "max_sec": 0.0}
            )
            m["count"] += t["count"]
            m["total_sec"] += t["total_sec"]
            m["max_sec"] = max(m["max_sec"], t["max_sec"])
        for name, n in s.get("counters", {}).items():
            counters[name] = counters.get(name, 0) + n
    for m in timers.values():
        m["mean_sec"] = m["total_sec"] / m["count"] if m["count"] else 0.0
    return {"timers": timers, "counters": counters}
