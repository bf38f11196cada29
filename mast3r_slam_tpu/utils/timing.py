"""Per-stage timing + metrics stream.

Replaces the reference's CUDA-event tic/toc (tictoc.py:4-30) with a
host-side timer that understands JAX async dispatch: device work is fenced
with a tiny host readback (block_until_ready does not actually block over
remote-TPU relays).  Timings accumulate in ring buffers per stage so the
engine can export a live metrics stream (FPS/latency percentiles) — the
first-class observability SURVEY.md §5 calls for.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, Optional

import numpy as np


def fence(x) -> None:
    """Force completion of device work feeding x (tiny host readback)."""
    try:
        import jax

        leaf = jax.tree.leaves(x)
        if leaf:
            np.asarray(leaf[0]).ravel()[:1]
    except Exception:
        pass


class StageTimer:
    """Accumulates wall-time per named stage; optional device fencing."""

    def __init__(self, window: int = 120, sync: bool = True):
        self.window = window
        self.sync = sync
        self.samples: Dict[str, list] = defaultdict(list)

    @contextmanager
    def time(self, name: str, result=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if self.sync and "result" in out:
            fence(out["result"])
        elif self.sync and result is not None:
            fence(result)
        dt = time.perf_counter() - t0
        buf = self.samples[name]
        buf.append(dt)
        if len(buf) > self.window:
            del buf[: len(buf) - self.window]

    def stats(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, buf in self.samples.items():
            if not buf:
                continue
            arr = np.asarray(buf)
            p50 = float(np.percentile(arr, 50) * 1e3)
            p95 = float(np.percentile(arr, 95) * 1e3)
            out[name] = {
                "mean_ms": float(arr.mean() * 1e3),
                "p50_ms": p50,
                "p95_ms": p95,
                # latency jitter: how much the tail departs from the typical
                # frame — the stat that exposes backend-induced stalls
                "jitter_ms": p95 - p50,
                "count": int(len(arr)),
            }
        return out

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stats().items()):
            lines.append(
                f"{name:24s} mean {s['mean_ms']:8.2f} ms  "
                f"p50 {s['p50_ms']:8.2f}  p95 {s['p95_ms']:8.2f}  n={s['count']}"
            )
        return "\n".join(lines)


_GLOBAL: Optional[StageTimer] = None


def global_timer() -> StageTimer:
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = StageTimer()
    return _GLOBAL
