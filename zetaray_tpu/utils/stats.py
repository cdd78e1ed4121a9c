"""Frame stats + kernel timing (App::AddFrameStat / GpuTimer analogs).

The reference keeps per-frame stat groups, a 60-frame frame-time history,
and per-pass GPU timestamps shown in the UI (Win32App.cpp:609-646,
GpuTimer.h:28-48). Here:

  - ``FrameStats``: named per-frame counters + ring history;
  - ``KernelTimer``: wall-clock spans around dispatch groups. NOTE on this
    tunneled TPU, block_until_ready does not imply execution completion, so
    per-pass device timings are *pipelined wall estimates*; exact per-kernel
    times come from jax.profiler traces when available.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from contextlib import contextmanager


class FrameStats:
    HISTORY = 60  # frames, like the reference's frame-time graph

    def __init__(self):
        self._curr: dict[str, dict[str, float]] = defaultdict(dict)
        self._history: deque = deque(maxlen=self.HISTORY)
        self._frame_times: deque = deque(maxlen=self.HISTORY)
        self._frame_start = None
        self.frame_index = 0

    def begin_frame(self):
        self._frame_start = time.perf_counter()
        self._curr = defaultdict(dict)

    def add(self, group: str, name: str, value) -> None:
        """App::AddFrameStat equivalent."""
        self._curr[group][name] = float(value)

    def end_frame(self):
        dt = 0.0
        if self._frame_start is not None:
            dt = time.perf_counter() - self._frame_start
        self._frame_times.append(dt)
        self._history.append({g: dict(v) for g, v in self._curr.items()})
        self.frame_index += 1
        return dt

    @property
    def fps(self) -> float:
        if not self._frame_times:
            return 0.0
        avg = sum(self._frame_times) / len(self._frame_times)
        return 1.0 / avg if avg > 0 else 0.0

    def frame_time_ms(self) -> float:
        return (self._frame_times[-1] * 1000.0) if self._frame_times else 0.0

    def report(self) -> str:
        lines = [
            f"frame {self.frame_index} | {self.frame_time_ms():.2f} ms | "
            f"{self.fps:.1f} fps (avg over {len(self._frame_times)})"
        ]
        last = self._history[-1] if self._history else {}
        for group in sorted(last):
            for name, v in sorted(last[group].items()):
                lines.append(f"  {group}/{name}: {v:g}")
        return "\n".join(lines)


class KernelTimer:
    """Named timing spans (GpuTimer::BeginQuery/EndQuery shape)."""

    def __init__(self):
        self.spans: dict[str, float] = {}

    @contextmanager
    def span(self, name: str, sync=None):
        """Time a block; pass ``sync=fn`` to force completion (e.g.
        ``lambda: float(x.sum())``) for honest device timing."""
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync()
        self.spans[name] = (time.perf_counter() - t0) * 1000.0

    def report(self) -> str:
        return "\n".join(f"  {k}: {v:.2f} ms" for k, v in sorted(self.spans.items()))


stats = FrameStats()
