"""In-process A/B: backend matching pixel budget (local_opt.pixel_stride).

Times the backend edge-compute programs (_add_factors_compute symmetric
B=1 consecutive + _add_factors_forward B=3 candidates — the bench task
shape) at stride 1 vs 2, interleaved in ONE process on the live device.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.factor_graph import (
    MatchKwargs,
    _add_factors_compute,
    _add_factors_forward,
)


def main():
    H, W = 384, 512
    N = H * W
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
    key = jax.random.key(0)
    base = jnp.abs(jax.random.normal(key, (1, H, W, 3))) + 0.5

    def view(k):
        kk = jax.random.key(k)
        X = base + jax.random.normal(kk, (1, H, W, 3)) * 0.01
        D = jax.random.normal(kk, (1, H, W, 24))
        Q = jnp.ones((1, H, W)) * 2.0
        C = jnp.ones((1, H, W))  # conf slot (unused by the pair matchers,
        # but B>1 unrolling slices every quad element)
        return (X, C, D, Q)

    res_sym = (view(1), view(2), view(3), view(4))
    cand = [view(5), view(6), view(7)]
    res_fwd = tuple(
        tuple(jnp.concatenate([v[i] for v in cand]) for i in range(4))
        for _ in (0, 1)
    )

    def task(stride):
        o1 = _add_factors_compute((H, W), res_sym, -1.0, mk, stride)
        o2 = _add_factors_forward((H, W), res_fwd, -1.0, mk, stride)
        return o1["idx_i2j"], o2["idx_i2j"]

    def fence(o):
        for leaf in jax.tree_util.tree_leaves(o):
            np.asarray(leaf).ravel()[:1]

    for s in (1, 2):
        fence(task(s))  # compile + warm
    print("warm done", file=sys.stderr)
    for r in range(5):
        t0 = time.time()
        for _ in range(3):
            o = task(1)
        fence(o)
        t1 = time.time()
        for _ in range(3):
            o = task(2)
        fence(o)
        t2 = time.time()
        print(f"round {r}: stride1={1e3*(t1-t0)/3:.1f} ms  "
              f"stride2={1e3*(t2-t1)/3:.1f} ms  ratio={(t2-t1)/(t1-t0):.2f}")


if __name__ == "__main__":
    main()
