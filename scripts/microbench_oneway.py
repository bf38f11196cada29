"""Backend task cost: symmetric both-ways vs `oneway_nonconsec` (r4).

A backend task with 1 consecutive + 3 retrieval candidates is the
bench-cadence worst case.  The reference decodes BOTH directions and
matches both ways for every pair (global_opt.py:30-79); the knob keeps
that for the consecutive edge and runs one asymmetric decode + forward
matching for the candidates.  This measures the full task compute
(decode + matching dispatches, as issued by FactorGraph.add_factors)
A/B-interleaved in ONE process with fenced readbacks.

Run on TPU: python scripts/microbench_oneway.py
"""

import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from mast3r_slam_tpu.config import load_config
from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models.interface import MASt3RModel
from mast3r_slam_tpu.slam.factor_graph import (
    MatchKwargs,
    _add_factors_compute,
    _add_factors_forward,
)

H, W = 384, 512
N_CONSEC, N_CAND = 1, 3


def main():
    print(f"devices: {jax.devices()}", flush=True)
    speed_cfg = load_config("speed")
    mcfg = M.VIT_LARGE
    if speed_cfg.get("engine", {}).get("head_dtype") == "bfloat16":
        mcfg = dataclasses.replace(mcfg, head_dtype=jnp.bfloat16)
    params = M.init_params(jax.random.key(0), mcfg)
    model = MASt3RModel(params, mcfg, (H, W))
    grid = mcfg.grid((H, W))
    n_tok = grid[0] * grid[1]

    m = speed_cfg["matching"]
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

    key = jax.random.key(1)
    B = N_CONSEC + N_CAND
    feat_i = jax.random.normal(key, (B, n_tok, mcfg.enc_embed_dim), jnp.float32)
    feat_j = jax.random.normal(
        jax.random.key(2), (B, n_tok, mcfg.enc_embed_dim), jnp.float32
    )
    pos = jnp.tile(M.patch_positions(1, grid), (B, 1, 1))

    def task_symmetric():
        res = model.symmetric(feat_i, pos, feat_j, pos)
        return _add_factors_compute((H, W), res, -1.0, mk)["idx_i2j"]

    def task_oneway():
        res_c = model.symmetric(
            feat_i[:N_CONSEC], pos[:N_CONSEC], feat_j[:N_CONSEC], pos[:N_CONSEC]
        )
        o1 = _add_factors_compute((H, W), res_c, -1.0, mk)["idx_i2j"]
        res_f = model.asymmetric(
            feat_i[N_CONSEC:], pos[N_CONSEC:], feat_j[N_CONSEC:], pos[N_CONSEC:]
        )
        o2 = _add_factors_forward((H, W), res_f, -1.0, mk)["idx_i2j"]
        return o1, o2

    def task_reuse():
        # local_opt.reuse_tracker_match + oneway_nonconsec together, in the
        # ENGINE's grouping (factor_graph.add_factors): the consecutive
        # edge's backward direction is the tracker's capture (free), so its
        # group is one forward decode + matching at B=1; candidates keep
        # their own forward-only program at B=3
        res_c = model.asymmetric(
            feat_i[:N_CONSEC], pos[:N_CONSEC], feat_j[:N_CONSEC], pos[:N_CONSEC]
        )
        o1 = _add_factors_forward((H, W), res_c, -1.0, mk)["idx_i2j"]
        res_f = model.asymmetric(
            feat_i[N_CONSEC:], pos[N_CONSEC:], feat_j[N_CONSEC:], pos[N_CONSEC:]
        )
        o2 = _add_factors_forward((H, W), res_f, -1.0, mk)["idx_i2j"]
        return o1, o2

    def task_reuse_merged():
        # one merged B=4 forward program — measured SLOWER than the split
        # grouping above (logs/tpu_r4_oneway2.log: 218-268 ms vs ~160), so
        # the engine keeps per-group programs
        res = model.asymmetric(feat_i, pos, feat_j, pos)
        return _add_factors_forward((H, W), res, -1.0, mk)["idx_i2j"]

    def fence(o):
        # fence EVERY leaf: the oneway/reuse variants return (o1, o2) with
        # o2 dispatched last — fencing only the first leaf undercounts them
        # (ADVICE r4)
        for leaf in jax.tree_util.tree_leaves(o):
            np.asarray(leaf).ravel()[:1]

    variants = (
        ("sym", task_symmetric),
        ("oneway", task_oneway),
        ("reuse", task_reuse),
    )
    for _, fn in variants:
        fence(fn())  # warm

    rounds = 5
    for r in range(rounds):
        out = {}
        for name, fn in variants:
            t0 = time.time()
            for _ in range(3):
                o = fn()
            fence(o)
            out[name] = (time.time() - t0) / 3
        print(
            f"round {r}: sym {out['sym']*1e3:7.1f} ms/task   "
            f"oneway {out['oneway']*1e3:7.1f} ms/task   "
            f"reuse {out['reuse']*1e3:7.1f} ms/task   "
            f"ratios {out['oneway']/out['sym']:.2f}/"
            f"{out['reuse']/out['sym']:.2f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
