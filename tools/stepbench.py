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
    from tsxcount_tpu.ops.window import extract_kmers, intervals_to_valid

    spec = KmerSpec(args.k)
    batch = BatchSpec(spec, args.batch_words)
    store = CountStore(spec, capacity=1 << args.l)
    r = args.merge_every

    rng = np.random.default_rng(0)
    buf_np = np.full(batch.buf_words, 0xFFFFFFFF, dtype=np.uint32)
    buf_np[: batch.total_words] = rng.integers(
        0, 2**32, size=batch.total_words, dtype=np.uint32
    )
    buf_np[batch.capacity_words : batch.total_words] = 0
    # synthetic intervals: ~one valid run per 600 positions (bench-like)
    tw, m = batch.total_words, batch.max_intervals
    n_iv = max(1, batch.positions // 600)
    bounds = np.linspace(0, batch.positions, n_iv + 1, dtype=np.uint32)
    buf_np[tw : tw + n_iv] = bounds[:-1]
    buf_np[tw + m : tw + m + n_iv] = bounds[1:] - spec.k  # k-wide gaps

    def timed(label, fn, *fargs, reps=args.reps):
        fence(fn(*fargs))
        t0 = time.perf_counter()
        for _ in range(reps):
            fence(fn(*fargs))
        dt = (time.perf_counter() - t0) / reps
        print(f"{label:>18}: {dt*1e3:9.1f} ms")
        return dt

    h2d = jax.jit(lambda b: b.sum())
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fence(h2d(jax.device_put(buf_np)))
    print(f"{'h2d+touch':>18}: {(time.perf_counter()-t0)/args.reps*1e3:9.1f} ms")

    def dedupe_fn(b):
        kmers = extract_kmers(b[: batch.total_words], batch)
        valid = intervals_to_valid(b[batch.total_words :], batch)
        return count_unique(kmers, valid, spec=spec)

    dedupe = jax.jit(dedupe_fn)
    buf = jax.device_put(buf_np)
    uc = dedupe(buf)
    timed("extract+dedupe", dedupe, buf)

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
