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


def robust_diff_time(run_batch, n1: int = 5, n2: int = 15, reps: int = 3):
    """Per-iteration time from fenced batch timings, robust to dispatch jitter.

    ``run_batch(n)`` must execute n iterations and FENCE (tiny readback)
    before returning its wall seconds.  Differential timing — slope between
    batch sizes n1 < n2 — cancels the fixed per-batch dispatch/readback
    overhead of remote-TPU tunnels, but a min-of-batches differential can go
    NEGATIVE when only one batch catches a jitter spike (observed as
    ``encode=-11.47ms`` in BENCH_r03; the tunnel adds ~10 ms spikes).

    Robustness (VERDICT r3 item 4):
      * median over ``reps`` samples of each batch size (a single spike
        cannot move the median once reps >= 3);
      * the differential is clamped to the fastest whole-batch average
        (an upper bound that INCLUDES overhead — per-iteration time can
        never legitimately exceed it);
      * if the differential still comes out non-positive (jitter swamped
        the signal entirely), fall back to that upper bound and flag it.

    Returns ``(seconds_per_iter, is_upper_bound)``; the result is always
    positive and finite.
    """
    t1 = sorted(run_batch(n1) for _ in range(reps))
    t2 = sorted(run_batch(n2) for _ in range(reps))
    med1 = t1[len(t1) // 2]
    med2 = t2[len(t2) // 2]
    upper = min(t2) / n2  # fastest batch average (includes fixed overhead)
    dt = (med2 - med1) / (n2 - n1)
    if not (dt > 0.0 and np.isfinite(dt)):
        return upper, True
    return min(dt, upper), False


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
