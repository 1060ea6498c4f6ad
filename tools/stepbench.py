#!/usr/bin/env python
"""Breakdown of the counting step's phases at bench shapes (readback-fenced).

Phases: H2D transfer, extract+dedupe (per batch), merge_stacked (per R
batches), and the packer (host).  Guides optimization: run after changing
the pipeline.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fence(x):
    import jax

    leaves = jax.tree_util.tree_leaves(x)
    jax.device_get(leaves[0].ravel()[0])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=25)
    ap.add_argument("--batch-words", type=int, default=1 << 20)
    ap.add_argument("--merge-every", type=int, default=2)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tsxcount_tpu.config import BatchSpec, KmerSpec
    from tsxcount_tpu.core.store import CountStore
    from tsxcount_tpu.ops.count import count_unique
    from tsxcount_tpu.ops.window import expand_vmask, extract_kmers

    spec = KmerSpec(args.k)
    batch = BatchSpec(spec, args.batch_words)
    store = CountStore(spec, capacity=1 << args.l)
    r = args.merge_every

    rng = np.random.default_rng(0)
    words_np = rng.integers(
        0, 2**32, size=batch.total_words, dtype=np.uint32
    )
    words_np[-batch.pad_words :] = 0
    vmask_np = np.full(batch.vmask_words, 0xFFFFFFFF, dtype=np.uint32)

    def timed(label, fn, *fargs, reps=args.reps):
        fence(fn(*fargs))
        t0 = time.perf_counter()
        for _ in range(reps):
            fence(fn(*fargs))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:>18}: {dt*1e3:9.1f} ms")
        return dt

    h2d = jax.jit(lambda w, v: (w.sum(), v.sum()))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fence(h2d(jax.device_put(words_np), jax.device_put(vmask_np)))
    print(f"{'h2d+touch':>18}: {(time.perf_counter()-t0)/args.reps*1e3:9.1f} ms")

    dedupe = jax.jit(
        lambda w, v: count_unique(
            extract_kmers(w, batch), expand_vmask(v, batch), spec=spec
        )
    )
    words = jax.device_put(words_np)
    vmask = jax.device_put(vmask_np)
    uc = dedupe(words, vmask)
    timed("extract+dedupe", dedupe, words, vmask)

    merge = jax.jit(store.merge_stacked)
    state = store.init_state()
    k_s = jnp.stack([uc.keys] * r)
    c_s = jnp.stack([uc.counts] * r)
    v_s = jnp.stack([uc.valid] * r)
    timed(f"merge_stacked R={r}", merge, state, k_s, c_s, v_s)

    extract = jax.jit(lambda w: extract_kmers(w, batch))
    timed("extract only", extract, words)
    return 0


if __name__ == "__main__":
    sys.exit(main())
