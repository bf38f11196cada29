"""Bucketed-IVF search scaling with store growth (VERDICT r3 item 7).

The r3 flat IVF scanned ALL capacity entries per query word —
O(capacity x query-words), linear in store doublings and measured as the
longest backend stage on grown stores.  The r4 word-bucketed layout
(`retrieval/asmk.py:DeviceIVF`) gathers only each query word's bucket, so
device time should track the FILLED bucket depth (~entries/num_words),
i.e. stay near-flat across store doublings at production sizing.

Run ON TPU (plain `python scripts/microbench_ivf.py`).  Prints search time
at 1x / 4x / 16x the reference's 512-keyframe fill (production shape:
64k-word codebook, 300 features/kf, MA-5 queries).

r3 numbers for reference (flat scan, 1024-word toy sizing):
  10240 entries (512 kf): 0.819 ms; 20480 (1024 kf): 1.259 ms — linear.
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
from mast3r_slam_tpu.utils.timing import robust_diff_time  # noqa: E402

DIM = 64            # retrieval head output dim (prod config)
NFEAT = 300         # features per keyframe (released checkpoint nfeat)
NUM_WORDS = 65536   # released codebook size ('64k')
MA_QUERY = 5
N_KF = 512


def main():
    rng = np.random.default_rng(0)
    s = ASMKSettings(capacity=N_KF * NFEAT, max_images=16 * N_KF)
    ivf = DeviceIVF(dim=DIM, settings=s, num_words=NUM_WORDS)

    def add_block(lo, hi):
        t0 = time.time()
        for im in range(lo, hi):
            packed = binarize_pack(
                jnp.asarray(rng.normal(size=(NFEAT, DIM)).astype(np.float32))
            )
            words = jnp.asarray(
                rng.integers(0, NUM_WORDS, size=(NFEAT,), dtype=np.int32)
            )
            ivf.add(packed, words, jnp.ones((NFEAT,), bool), imid=im)
        print(
            f"filled {ivf.n_entries} entries / {ivf.n_images} images "
            f"(bucket depth {ivf.bucket_cap}) in {time.time()-t0:.1f}s",
            flush=True,
        )

    nq = NFEAT * MA_QUERY
    q_packed = binarize_pack(
        jnp.asarray(rng.normal(size=(nq, DIM)).astype(np.float32))
    )
    q_words = jnp.asarray(rng.integers(0, NUM_WORDS, size=(nq,), dtype=np.int32))
    q_valid = jnp.ones((nq,), bool)

    def timeit():
        def batch(n):
            t0 = time.time()
            for _ in range(n):
                o = ivf.search(q_packed, q_words, q_valid)
            _ = np.asarray(o)[:1]
            return time.time() - t0

        batch(3)
        dt, ub = robust_diff_time(batch, n1=5, n2=25, reps=3)
        return dt, ub

    hi = 0
    for mult in (1, 4, 16):
        lo, hi = hi, mult * N_KF
        add_block(lo, hi)
        _ = np.asarray(ivf.search(q_packed, q_words, q_valid))  # compile+fence
        dt, ub = timeit()
        flag = " (upper bound)" if ub else ""
        print(
            f"search at {ivf.n_entries} entries ({hi} kf, depth "
            f"{ivf.bucket_cap}): {dt*1e3:.3f} ms{flag}",
            flush=True,
        )


if __name__ == "__main__":
    main()
