"""Backend two-way matching cost vs batch size (r4 ledger follow-up).

The system device-time ledger puts `_add_factors_compute` at ~215 ms per
backend task — the largest backend device cost.  It matches 2B images in
ONE batched program; the tracked-frame matcher does B=1 in ~16 ms, so
per-image batched cost (~27-36 ms at B=3..4) may carry a batching
penalty (bigger window tables / gather shapes).  This measures the
batched program at B=1/2/4 against B sequential B=1 calls.

Run on TPU: python scripts/microbench_backend_match.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.factor_graph import MatchKwargs, _add_factors_compute
from mast3r_slam_tpu.utils.timing import robust_diff_time

H, W = 384, 512


def main():
    print(f"devices: {jax.devices()}", flush=True)
    cfg = load_config("speed")
    m = cfg["matching"]
    mk = MatchKwargs(
        max_iter=m["max_iter"], lambda_init=m["lambda_init"],
        convergence_thresh=m["convergence_thresh"],
        dist_thresh=1e9, radius=m["radius"], dilation_max=m["dilation_max"],
        refine_gate=m.get("refine_gate", "none"),
        refine_budget_frac=m.get("refine_budget_frac", 0.125),
        refine_subset_dilations=(
            tuple(m["refine_subset_dilations"])
            if m.get("refine_subset_dilations") else None
        ),
        refine_final_radius=m.get("refine_final_radius"),
        proj_gate=m.get("proj_gate", "none"),
        proj_init=m.get("proj_init", "warm"),
        proj_pre_iters=m.get("proj_pre_iters", 2),
        proj_budget_frac=m.get("proj_budget_frac", 0.125),
    )
    rng = np.random.default_rng(0)

    def res_of(B):
        def maps(ch):
            return jnp.asarray(
                rng.normal(size=(B, H, W, ch)).astype(np.float32)
            )

        def quad():
            X = jnp.abs(maps(3)) + 0.5
            return (X, maps(1), maps(24), jnp.abs(maps(1)) + 1.0)

        return (quad(), quad(), quad(), quad())

    for B in (1, 2, 4):
        res = res_of(B)

        def run():
            return _add_factors_compute((H, W), res, -1.0, mk)["idx_i2j"]

        np.asarray(run()).ravel()[:1]
        dt, ub = robust_diff_time(
            lambda n: _batch(run, n), n1=2, n2=6, reps=3
        )
        print(
            f"batched B={B} (2B={2*B} matchings): {dt*1e3:7.1f} ms "
            f"({dt*1e3/(2*B):5.1f} ms/matching){' UB' if ub else ''}",
            flush=True,
        )


def _batch(fn, n):
    t0 = time.time()
    for _ in range(n):
        o = fn()
    np.asarray(o).ravel()[:1]
    return time.time() - t0


if __name__ == "__main__":
    main()
