"""Observability: per-phase wall timers and optional device traces.

The reference's only tracing is one chrono around the build loop printed as
"build time cost" (kmodel.hpp:67,84-85,145).  Here timing is first-class:
every pipeline run fills a ``Phases`` breakdown (exposed on PipelineStats
and printed by the CLI under KMCEX_VERBOSE=1), and ``device_trace`` captures
a jax.profiler trace for xprof/tensorboard when KMCEX_TRACE_DIR is set.
"""

from __future__ import annotations

import contextlib
import os
import time


class Phases:
    """Accumulating named wall-clock phase timers."""

    def __init__(self) -> None:
        self.seconds: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.seconds[name] = self.seconds.get(name, 0.0) + time.time() - t0

    def add(self, name: str, secs: float) -> None:
        self.seconds[name] = self.seconds.get(name, 0.0) + secs

    def report(self) -> str:
        total = sum(self.seconds.values())
        lines = [
            f"   {name:<28s}: {secs:8.3f}s"
            for name, secs in sorted(self.seconds.items(), key=lambda kv: -kv[1])
        ]
        lines.append(f"   {'(sum of phases)':<28s}: {total:8.3f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(label: str = "kmcex"):
    """jax.profiler trace into $KMCEX_TRACE_DIR (no-op when unset)."""
    trace_dir = os.environ.get("KMCEX_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(trace_dir, label)):
        yield


def verbose() -> bool:
    return os.environ.get("KMCEX_VERBOSE", "") not in ("", "0")
