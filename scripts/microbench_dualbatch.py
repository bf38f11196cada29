"""Does batching the two decoder branches / two heads win on TPU?

The decoder's per-step branch updates are independent given the previous
carry (dust3r/model.py:171-191 semantics), so branch1/branch2 can run as one
weight-batched (bmm) program instead of two serial B=1 programs.  Same for
the two DPT/MLP heads.  This measures both layouts in ONE process, plus
whether bf16-stored f32-head weights are numerically free (XLA TPU DEFAULT
matmul precision truncates f32 operands to bf16 anyway).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.models import mast3r as M
from mast3r_slam_tpu.models import dpt as dpt_mod
from mast3r_slam_tpu.models.layers import decoder_block, layer_norm, linear, mlp, rope2d_tables


def timeit(fn, *args, n1=3, n2=12, reps=3):
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


if os.environ.get("DUALBENCH_TINY"):  # CPU smoke: logic/numerics only
    jax.config.update("jax_platforms", "cpu")
    H, W = 64, 96
    cfg = M.VIT_TINY_TEST
else:
    H, W = 384, 512
    cfg = M.VIT_LARGE
grid = cfg.grid((H, W))
N = grid[0] * grid[1]
params = M.init_params(jax.random.key(0), cfg)
img = jax.random.normal(jax.random.key(1), (1, 3, H, W), jnp.float32) * 0.5

feat, pos = jax.block_until_ready(jax.jit(
    lambda p, im: M.encode_image(p, cfg, im))(params, img))
kf_feat = jax.random.normal(jax.random.key(2), (1, N, cfg.enc_embed_dim))
kf_pos = M.patch_positions(1, grid)

# --- decoder: serial branches (current) vs branch-batched ------------------
dec_serial = jax.jit(lambda p, f, po: M.decode(p, cfg, f, po, kf_feat, kf_pos))
print(f"decode serial:        {timeit(dec_serial, params, feat, pos)*1e3:8.2f} ms", flush=True)

joint_blocks = jax.tree.map(
    lambda a, b: jnp.stack([a, b], axis=1), params["dec_blocks"], params["dec_blocks2"]
)  # leaves (12, 2, ...)


def decode_batched(params, joint_blocks, feat1, pos1, feat2, pos2):
    f1 = linear(params["decoder_embed"], feat1.astype(cfg.dtype))
    f2 = linear(params["decoder_embed"], feat2.astype(cfg.dtype))
    rope1 = rope2d_tables(pos1, cfg.head_dim_dec, cfg.rope_base)
    rope2 = rope2d_tables(pos2, cfg.head_dim_dec, cfg.rope_base)
    f = jnp.stack([f1, f2], axis=0)  # (2, B, N, D)
    rope_q = jax.tree.map(lambda a, b: jnp.stack([a, b]), rope1, rope2)
    rope_k = jax.tree.map(lambda a, b: jnp.stack([a, b]), rope2, rope1)

    def step(f, bp):
        m = f[::-1]
        nf = jax.vmap(
            lambda p, x, y, rq, rk: decoder_block(
                p, x, y, rq, rk, cfg.dec_num_heads, cfg.attn_impl
            )
        )(bp, f, m, rope_q, rope_k)
        return nf, nf

    _, ys = jax.lax.scan(step, f, joint_blocks, unroll=cfg.scan_unroll)
    h6 = ys[5].astype(jnp.float32)
    h9 = ys[8].astype(jnp.float32)
    hf = layer_norm(params["dec_norm"], ys[-1]).astype(jnp.float32)
    return (
        (feat1, h6[0], h9[0], hf[0]),
        (feat2, h6[1], h9[1], hf[1]),
    )


dec_b = jax.jit(lambda p, jb, f, po: decode_batched(p, jb, f, po, kf_feat, kf_pos))
print(f"decode branch-batched:{timeit(dec_b, params, joint_blocks, feat, pos)*1e3:8.2f} ms", flush=True)

# numerics: identical math reordered; bf16 trunk tolerance
o1 = dec_serial(params, feat, pos)
o2 = dec_b(params, joint_blocks, feat, pos)
d = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)))
print(f"decode batched max|diff|: {d:.2e}", flush=True)

hooks1, hooks2 = jax.block_until_ready(dec_serial(params, feat, pos))

# --- DPT: two serial heads vs one vmapped stacked head ---------------------
def dpt2_serial(p, h1, h2):
    r1 = dpt_mod.dpt_forward(p["head1"]["dpt"], list(h1), grid, 4)
    r2 = dpt_mod.dpt_forward(p["head2"]["dpt"], list(h2), grid, 4)
    return r1, r2

dpt2 = jax.jit(dpt2_serial)
print(f"DPT x2 serial:        {timeit(dpt2, params, hooks1, hooks2)*1e3:8.2f} ms", flush=True)

dpt_joint = jax.tree.map(
    lambda a, b: jnp.stack([a, b]), params["head1"]["dpt"], params["head2"]["dpt"]
)
hooks_joint = [jnp.stack([a, b]) for a, b in zip(hooks1, hooks2)]

def dpt2_batched(jp, hj):
    return jax.vmap(lambda p, h: dpt_mod.dpt_forward(p, list(h), grid, 4))(jp, tuple(hj))

dpt2b = jax.jit(dpt2_batched)
print(f"DPT x2 vmapped:       {timeit(dpt2b, dpt_joint, hooks_joint)*1e3:8.2f} ms", flush=True)
r1, r2 = dpt2(params, hooks1, hooks2)
rb = dpt2b(dpt_joint, hooks_joint)
d = max(float(jnp.max(jnp.abs(r1 - rb[0]))), float(jnp.max(jnp.abs(r2 - rb[1]))))
print(f"DPT vmapped max|diff|: {d:.2e}", flush=True)

# --- bf16-stored head weights: free or not under DEFAULT precision? --------
dpt_bf16 = jax.tree_util.tree_map_with_path(
    lambda path, leaf: leaf.astype(jnp.bfloat16).astype(jnp.float32)
    if path and getattr(path[-1], "key", "") == "w" else leaf,
    params["head1"]["dpt"],
)
dpt1 = jax.jit(lambda p, h: dpt_mod.dpt_forward(p, list(h), grid, 4))
ra = dpt1(params["head1"]["dpt"], hooks1)
rc = dpt1(dpt_bf16, hooks1)
print(f"bf16-stored DPT weights max|diff|: {float(jnp.max(jnp.abs(ra - rc))):.2e} "
      f"(scale {float(jnp.max(jnp.abs(ra))):.2e})", flush=True)

# --- local MLP x2 serial vs stacked bmm + postprocess cost ------------------
def mlp2_serial(p, h1, h2):
    c1 = jnp.concatenate([h1[0], h1[3]], axis=-1)
    c2 = jnp.concatenate([h2[0], h2[3]], axis=-1)
    return mlp(p["head1"]["local_mlp"], c1), mlp(p["head2"]["local_mlp"], c2)

mlp2 = jax.jit(mlp2_serial)
print(f"local MLP x2 serial:  {timeit(mlp2, params, hooks1, hooks2, n2=24)*1e3:8.2f} ms", flush=True)

mlp_joint = jax.tree.map(
    lambda a, b: jnp.stack([a, b]), params["head1"]["local_mlp"], params["head2"]["local_mlp"]
)

def mlp2_batched(jp, h1, h2):
    c = jnp.stack([
        jnp.concatenate([h1[0], h1[3]], axis=-1),
        jnp.concatenate([h2[0], h2[3]], axis=-1),
    ])
    return jax.vmap(mlp)(jp, c)

mlp2b = jax.jit(mlp2_batched)
print(f"local MLP x2 stacked: {timeit(mlp2b, mlp_joint, hooks1, hooks2, n2=24)*1e3:8.2f} ms", flush=True)

raw = jax.block_until_ready(
    jax.jit(lambda p, h: M.head_forward(p["head1"], cfg, h, grid))(params, hooks1)
)
pp = jax.jit(lambda r: M.postprocess(r, cfg))
print(f"postprocess x1:       {timeit(pp, raw, n2=24)*1e3:8.2f} ms", flush=True)
