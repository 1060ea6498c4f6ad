#!/usr/bin/env python
"""Probe the host<->device link's behavior (axon tunnel or real PCIe).

Answers three questions that shape the ingest pipeline:
  1. enqueue cost — host-side time to dispatch a jitted call (no fence);
  2. H2D cost — device_put of a bench-sized batch buffer;
  3. overlap — does an H2D transfer proceed WHILE the device computes?
     (compute+put concurrently vs sequentially)

Usage: python tools/tunnelprobe.py [--reps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--chain", type=int, default=50)
    ap.add_argument("--mbytes", type=float, default=2.4)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    def fence(x):
        jax.device_get(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    print(f"platform={jax.default_backend()}")

    # 1. enqueue cost (async dispatch, no fence)
    null = jax.jit(lambda x: x + 1)
    z = jax.device_put(jnp.zeros((8,), jnp.int32))
    fence(null(z))
    t0 = time.perf_counter()
    outs = [null(z) for _ in range(args.reps * 4)]
    t_enq = (time.perf_counter() - t0) / (args.reps * 4)
    fence(outs[-1])
    print(f"enqueue (async, no fence): {t_enq*1e3:8.2f} ms/call")

    # fence latency
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fence(null(z))
    t_fence = (time.perf_counter() - t0) / args.reps
    print(f"dispatch+fence           : {t_fence*1e3:8.2f} ms/call")

    # 2. compute-only baseline: chained matmuls ~ tens of ms device time
    a = jax.device_put(jnp.ones((2048, 2048), jnp.bfloat16))

    @jax.jit
    def heavy(a):
        for _ in range(args.chain):
            a = (a @ a) * jnp.bfloat16(1e-3)
        return a

    fence(heavy(a))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fence(heavy(a))
    t_heavy = (time.perf_counter() - t0) / args.reps
    print(f"compute chain            : {t_heavy*1e3:8.2f} ms")

    # H2D cost of a bench-sized buffer
    buf = np.random.default_rng(0).integers(
        0, 2**32, size=int(args.mbytes * 2**20 / 4), dtype=np.uint32
    )
    touch = jax.jit(lambda b: b[::65536].sum())
    fence(touch(jax.device_put(buf)))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        fence(touch(jax.device_put(buf)))
    t_put = (time.perf_counter() - t0) / args.reps
    print(f"device_put {args.mbytes:.1f} MiB + touch: {t_put*1e3:8.2f} ms "
          f"({args.mbytes/max(t_put,1e-9):.1f} MiB/s)")

    # 3. overlap: dispatch compute, then put WHILE it runs
    fence(heavy(a))
    t0 = time.perf_counter()
    for _ in range(args.reps):
        h = heavy(a)          # async
        d = jax.device_put(buf)  # should stream during compute if overlapped
        fence(touch(d))
        fence(h)
    t_both = (time.perf_counter() - t0) / args.reps
    seq = t_heavy + t_put
    print(f"compute || H2D           : {t_both*1e3:8.2f} ms "
          f"(sequential would be {seq*1e3:.2f} ms -> overlap "
          f"{'YES' if t_both < 0.75*seq else 'NO'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
