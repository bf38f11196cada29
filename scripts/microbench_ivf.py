"""IVF search cost at full 512-keyframe fill (VERDICT r1 weak item 5).

The TPU IVF (`retrieval/asmk.py:_ivf_search`) is a DENSE masked scan: each of
the query's ~1.2k (word, vec) pairs scores hamming similarity against the
full entry array and scatter-adds into per-image accumulators.  At the
reference's production sizing (512 keyframes x 20 features x 3 codebook
assignments ~ 30k entries; capacity padded to the allocation) that is a
deliberate design point — this script measures it so the "dense scan is
fine at <=512 kf" claim is a number, not a guess.

Run ON TPU (plain `python scripts/microbench_ivf.py`).

Measured 2026-08-20 (v5e, one process):
  10240 entries (512 kf), 100 query words: 0.819 ms
  20480 entries (1024 kf):                 1.259 ms
Linear-ish in entries, and it runs on the BACKEND path (once per keyframe,
not per frame) — ~0.8 ms against a ~33 ms frame confirms the dense scan is
the right design point at (and well past) the reference's 512-kf sizing.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from mast3r_slam_tpu.retrieval.asmk import (  # noqa: E402
    ASMKSettings,
    DeviceIVF,
    binarize_pack,
)

DIM = 64          # retrieval head output dim (prod config)
NFEAT = 20        # features per keyframe stored (ma_build=1 -> 20 entries)
MA_QUERY = 5      # query-side multiple assignment
N_KF = 512


def main():
    rng = np.random.default_rng(0)
    s = ASMKSettings(capacity=N_KF * NFEAT, max_images=N_KF)
    ivf = DeviceIVF(dim=DIM, settings=s)

    t0 = time.time()
    for im in range(N_KF):
        packed = binarize_pack(
            jnp.asarray(rng.normal(size=(NFEAT, DIM)).astype(np.float32))
        )
        words = jnp.asarray(
            rng.integers(0, 65536, size=(NFEAT,), dtype=np.int32)
        )
        ivf.add(packed, words, jnp.ones((NFEAT,), bool), imid=im)
    print(f"filled {ivf.n_entries} entries / {ivf.n_images} images "
          f"in {time.time()-t0:.1f}s", flush=True)

    nq = NFEAT * MA_QUERY
    q_packed = binarize_pack(
        jnp.asarray(rng.normal(size=(nq, DIM)).astype(np.float32))
    )
    q_words = jnp.asarray(rng.integers(0, 65536, size=(nq,), dtype=np.int32))
    q_valid = jnp.ones((nq,), bool)

    def run():
        return ivf.search(q_packed, q_words, q_valid)

    out = run()
    _ = np.asarray(out)  # compile + fence (tunnel-safe readback)

    def timeit(n1=5, n2=25, reps=3):
        def batch(n):
            t0 = time.time()
            for _ in range(n):
                o = run()
            _ = np.asarray(o)[:1]
            return time.time() - t0

        batch(3)
        t1 = min(batch(n1) for _ in range(reps))
        t2 = min(batch(n2) for _ in range(reps))
        return (t2 - t1) / (n2 - n1)

    dt = timeit()
    print(f"_ivf_search at {ivf.n_entries} entries ({N_KF} kf), "
          f"{nq} query words: {dt*1e3:.3f} ms", flush=True)

    # and at the engine's growth ceiling (2x) to see the scaling slope
    for im in range(N_KF, 2 * N_KF):
        packed = binarize_pack(
            jnp.asarray(rng.normal(size=(NFEAT, DIM)).astype(np.float32))
        )
        words = jnp.asarray(
            rng.integers(0, 65536, size=(NFEAT,), dtype=np.int32)
        )
        ivf.add(packed, words, jnp.ones((NFEAT,), bool), imid=im)
    out = run()
    _ = np.asarray(out)
    dt2 = timeit()
    print(f"_ivf_search at {ivf.n_entries} entries ({2*N_KF} kf): "
          f"{dt2*1e3:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
