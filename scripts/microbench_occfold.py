"""A/B the occlusion-gather fold and the 2-level subset schedule on chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import matching


def timeit(fn, *args, n1=3, n2=9, reps=3):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]

    def run(n):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
        return time.time() - t0

    run(1)
    t1 = min(run(n1) for _ in range(reps))
    t2 = min(run(n2) for _ in range(reps))
    return (t2 - t1) / (n2 - n1)


H, W = 384, 512
N = H * W
key = jax.random.key(1)
uu, vv = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                      jnp.arange(H, dtype=jnp.float32))
z = 2.0 + 0.4 * jnp.sin(uu / 37.0) * jnp.cos(vv / 29.0)
X = jnp.stack([(uu - W / 2) / 500.0 * z, (vv - H / 2) / 500.0 * z, z], -1)[None]
X2 = X + jnp.array([0.03, 0.01, 0.02])
D = jax.random.normal(key, (1, H, W, 24), jnp.float32)
D = D / jnp.linalg.norm(D, axis=-1, keepdims=True)
idx0 = jnp.arange(N, dtype=jnp.int32)[None]

SPEED = dict(proj_gate="converged", refine_gate="converged", proj_init="best",
             proj_pre_iters=0, proj_budget_frac=0.0625,
             refine_budget_frac=0.0625, refine_final_radius=1)


def match_oldocc(X11, X21, D11, D21, idx_init, dil):
    """Pre-fold variant: separate full-N occlusion gather (old behaviour)."""
    B = X11.shape[0]
    rays, tgt, p_init = matching.prep_for_iter_proj(X11, X21, idx_init)
    p_pin = matching.pinhole_init(rays, tgt)
    p1, valid_proj = matching.iter_proj(
        rays, tgt, p_init, max_iter=10, gate="converged", pre_iters=0,
        budget_frac=0.0625, p_init_alt=p_pin,
    )
    p1 = p1.astype(jnp.int32)
    X11_flat = X11.reshape(B, H * W, 3)
    idx_lin = matching.pixel_to_lin(p1, W)
    X11_at = jnp.take_along_axis(X11_flat, idx_lin[..., None], axis=1)
    dists = jnp.linalg.norm(X11_at - X21.reshape(B, H * W, 3), axis=-1)
    valid = valid_proj & (dists < 0.1)
    p1 = matching.refine_matches_gated(
        D11, D21.reshape(B, H * W, -1), p1, valid_proj, radius=3,
        dilation_max=5, budget_frac=0.0625, subset_dilations=dil,
        final_radius=1,
    )
    return matching.pixel_to_lin(p1, W), valid[..., None]


for name, dil in (("(5,2,1)", (5, 2, 1)), ("(5,2)  ", (5, 2))):
    new = jax.jit(lambda a, b, c, d, e, dil=dil: matching.match(
        a, b, c, d, e, refine_subset_dilations=dil, **SPEED))
    old = jax.jit(lambda a, b, c, d, e, dil=dil: match_oldocc(a, b, c, d, e, dil))
    t_new = timeit(new, X, X2, D, D, idx0)
    t_old = timeit(old, X, X2, D, D, idx0)
    print(f"match dil={name}: old-occ {t_old*1e3:7.2f} ms   folded {t_new*1e3:7.2f} ms", flush=True)

# equality of outputs (fold must be semantics-preserving)
i_new, v_new = jax.jit(lambda a, b, c, d, e: matching.match(
    a, b, c, d, e, refine_subset_dilations=(5, 2, 1), **SPEED))(X, X2, D, D, idx0)
i_old, v_old = jax.jit(lambda a, b, c, d, e: match_oldocc(
    a, b, c, d, e, (5, 2, 1)))(X, X2, D, D, idx0)
print("idx equal:", bool(jnp.all(i_new == i_old)),
      " valid equal:", bool(jnp.all(v_new == v_old)), flush=True)
