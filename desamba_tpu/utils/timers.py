"""Run observability: peak RSS, cpu time, section timers, profiler hook.

TPU-native analogs of the reference's self-measurement machinery:
  * peakrss / cputime / realduration (lib/utils.c:355-390)
  * FUNC_GET_TIME{,_P} section timers (lib/utils.h:124-152)
  * end-of-run "Normal end program, MAX MEM:[x]Gbp." line (main.c:51)
plus an optional jax.profiler trace context for the device pipeline.
"""
from __future__ import annotations

import contextlib
import resource
import sys
import time


def peakrss_kb() -> int:
    """Peak RSS in KB (ru_maxrss; lib/utils.c:383-388)."""
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss


def cputime() -> float:
    """User + system CPU seconds (lib/utils.c:355-360)."""
    r = resource.getrusage(resource.RUSAGE_SELF)
    return (r.ru_utime + r.ru_stime)


def report_peak_rss(file=None) -> None:
    """The reference's exit line, same spelling (main.c:51)."""
    print(f"Normal end program, MAX MEM:[{peakrss_kb() / 1024 / 1024:f}]Gbp.\n",
          file=file or sys.stderr)


@contextlib.contextmanager
def section(name: str, file=None, enabled: bool = True):
    """FUNC_GET_TIME_P analog: prints `name:[seconds]` (lib/utils.h:138-152)."""
    t0 = time.time()
    try:
        yield
    finally:
        if enabled:
            print(f"{name}:[{time.time() - t0:f}]", file=file or sys.stderr)


class SectionTimes:
    """FUNC_GET_TIME analog: accumulate wall seconds per named section."""

    def __init__(self):
        self.times: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.time() - t0
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self, file=None) -> None:
        for name, t in sorted(self.times.items(), key=lambda kv: -kv[1]):
            print(f"{name}:[{t:f}] n={self.counts[name]}",
                  file=file or sys.stderr)


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace of the device pipeline when trace_dir is set
    (the jax-native replacement for the per-read timing stderr hooks,
    SURVEY.md section 5 'Tracing / profiling')."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    print(f"jax profiler trace written to {trace_dir}", file=sys.stderr)
