"""Lightweight per-stage timing/counter metrics (SURVEY §5 observability).

Zero-cost when disabled. Enable with VP9_METRICS=1 or
`metrics.enable()`; the decoder and the TPU recon path report stage
timings through the module-level collector. `report()` returns a
structured dict; `summary()` a human-readable table.

The reference relies on av_log counters scattered through vp9.c; here
the collector is explicit and queryable so production deployments can
export it (e.g. per-stage ms/frame for fleet dashboards).
"""
import os
import time
from collections import defaultdict
from contextlib import contextmanager


class Collector:
    def __init__(self):
        from .config import get_config
        self.enabled = get_config().metrics
        self._totals = defaultdict(float)
        self._counts = defaultdict(int)
        self._values = defaultdict(int)

    def enable(self):
        self.enabled = True

    def disable(self):
        self.enabled = False

    def reset(self):
        self._totals.clear()
        self._counts.clear()
        self._values.clear()

    @contextmanager
    def timer(self, name):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._totals[name] += time.perf_counter() - t0
            self._counts[name] += 1

    def add(self, name, value=1):
        if self.enabled:
            self._values[name] += value

    def report(self):
        """{stage: {"total_s", "count", "mean_ms"}} plus raw counters."""
        out = {}
        for k, tot in sorted(self._totals.items()):
            n = self._counts[k]
            out[k] = {"total_s": round(tot, 4), "count": n,
                      "mean_ms": round(tot / n * 1000, 3) if n else 0.0}
        for k, v in sorted(self._values.items()):
            out[k] = {"value": v}
        return out

    def summary(self):
        lines = []
        for k, d in self.report().items():
            if "total_s" in d:
                lines.append(f"{k:28s} {d['total_s']:9.3f}s "
                             f"x{d['count']:<6d} {d['mean_ms']:9.2f} ms/call")
            else:
                lines.append(f"{k:28s} {d['value']}")
        return "\n".join(lines)


metrics = Collector()
