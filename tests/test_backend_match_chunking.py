"""The backend matcher's per-pair unroll must be bitwise-identical to the
batched form (the unroll exists purely because batched matching lowers ~2x
worse per image past batch 2 on TPU — scripts/microbench_backend_match.py;
same math either way)."""

import numpy as np
import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.slam.factor_graph import (
    MatchKwargs,
    _add_factors_compute,
    _add_factors_pair,
)

H, W = 24, 32


def _mk():
    return MatchKwargs(
        max_iter=4, lambda_init=1e-8, convergence_thresh=1e-6,
        dist_thresh=1e9, radius=3, dilation_max=5, refine_gate="none",
        refine_budget_frac=0.125, refine_subset_dilations=None,
        refine_final_radius=None, proj_gate="none", proj_init="warm",
        proj_pre_iters=2, proj_budget_frac=0.125,
    )


def test_unrolled_matches_per_pair_oracle():
    rng = np.random.default_rng(0)
    B = 3

    def maps(ch):
        return jnp.asarray(rng.normal(size=(B, H, W, ch)).astype(np.float32))

    def quad():
        return (jnp.abs(maps(3)) + 0.5, maps(1), maps(24),
                jnp.abs(maps(1)) + 1.0)

    res = (quad(), quad(), quad(), quad())
    mk = _mk()
    out = _add_factors_compute((H, W), res, -1.0, mk)

    outs = []
    for b in range(B):
        sl = tuple(tuple(x[b : b + 1] for x in q) for q in res)
        outs.append(
            jax.jit(
                lambda s: _add_factors_pair((H, W), s, -1.0, mk)
            )(sl)
        )
    for k in out:
        ref = np.concatenate([np.asarray(o[k]) for o in outs])
        np.testing.assert_array_equal(np.asarray(out[k]), ref, err_msg=k)
