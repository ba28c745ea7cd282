"""Phase timing + device profiling hooks (SURVEY §5.1).

The reference's observability is timestamped stderr lines around phases
(/root/reference/cqf/CQF_mt.h:867-913, src/CQF-deNoise.cpp:215-221) plus an
optional compile-time lock-wait profiler (gqf.c:41,95-148).  The TPU-native
equivalents:

  * ``phase(name)`` — a context manager accumulating wall-clock and call
    counts per named phase; ``report()`` renders the breakdown.  This is
    the structured version of the reference's ad-hoc difftime logging.
  * device tracing — every ``phase`` is also a ``jax.profiler.
    TraceAnnotation``, so phases show up as named spans in an xprof/
    TensorBoard device trace.  Set ``SH_ASSEMBLY_TRACE_DIR=/some/dir`` to
    capture a full trace of a CLI run (``maybe_trace`` wraps the CLI
    mains); inspect with TensorBoard's profile plugin or xprof.

Timers are wall-clock on the host: a phase that ends while device work is
still in flight under-reports unless the caller block_until_ready()s —
the hot loops in models/counter and models/contiger already do at their
phase boundaries.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field

from .logging import log


@dataclass
class _PhaseStat:
    seconds: float = 0.0
    calls: int = 0


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per named phase.  Not thread-safe (the
    pipeline is single-threaded on the host; device parallelism lives
    inside jit programs)."""

    stats: dict[str, _PhaseStat] = field(default_factory=dict)
    t_start: float = field(default_factory=time.time)

    @contextlib.contextmanager
    def phase(self, name: str):
        import jax

        st = self.stats.setdefault(name, _PhaseStat())
        t0 = time.time()
        with jax.profiler.TraceAnnotation(name):
            yield
        st.seconds += time.time() - t0
        st.calls += 1

    def report(self, header: str = "phase breakdown") -> str:
        total = time.time() - self.t_start
        covered = sum(s.seconds for s in self.stats.values())
        lines = [f"{header} (total {total:.2f}s, "
                 f"{covered / total * 100 if total else 0:.0f}% covered):"]
        width = max((len(n) for n in self.stats), default=0)
        for name, s in sorted(self.stats.items(),
                              key=lambda kv: -kv[1].seconds):
            pct = s.seconds / total * 100 if total else 0.0
            lines.append(f"  {name:<{width}}  {s.seconds:8.2f}s {pct:5.1f}% "
                         f"({s.calls} calls)")
        return "\n".join(lines)

    def log_report(self, header: str = "phase breakdown") -> None:
        for line in self.report(header).splitlines():
            log(line)


# Process-global timer: library code records into this by default so CLIs
# get a breakdown without threading a timer through every signature.
GLOBAL = PhaseTimer()


def phase(name: str):
    return GLOBAL.phase(name)


def reset() -> None:
    GLOBAL.stats.clear()
    GLOBAL.t_start = time.time()


@contextlib.contextmanager
def maybe_trace():
    """Wrap a CLI main in a jax.profiler device trace when
    SH_ASSEMBLY_TRACE_DIR is set (xprof/TensorBoard-readable)."""
    trace_dir = os.environ.get("SH_ASSEMBLY_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    log(f"device trace -> {trace_dir}")
    with jax.profiler.trace(trace_dir):
        yield
