#!/usr/bin/env python
"""Focused probe for the r5 bucket-dedupe decision (VERDICT r4 #1).

Measures ONLY the shapes the bucket-partition design depends on:
  * flat lax.sort at the k=127 dedupe layout (3 keys / 9 cols) — baseline;
  * the same rows as B independent batched segments (chunk pre-sort and
    per-bucket sort candidates);
  * batched VMEM-sized segments (the per-bucket sort if B=1024).

Unbuffered prints after each probe so progress is visible through the
tunnel's long compiles.

Usage: python tools/bucketprobe.py [--n 9633792] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fence(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return jax.device_get(leaves[0].ravel()[0])


_BASE = 0.0


def timeit(fn, *args, reps=3):
    fence(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    fence(outs[-1])
    return max(0.0, (time.perf_counter() - t0 - _BASE)) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=602112 * 16)
    ap.add_argument("--reps", type=int, default=3)
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

    n = args.n
    rng = np.random.default_rng(0)
    cols = [
        jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        for _ in range(9)
    ]
    global _BASE
    null = jax.jit(lambda x: x + 1)
    z = jax.device_put(jnp.zeros((8,), jnp.int32))
    fence(null(z))
    t0 = time.perf_counter()
    outs = [null(z) for _ in range(args.reps)]
    fence(outs[-1])
    _BASE = time.perf_counter() - t0
    print(f"platform={jax.default_backend()} n={n} "
          f"(null baseline {_BASE/args.reps*1e3:.2f} ms/call)", flush=True)

    def probe(name, fn, *xs):
        t0 = time.perf_counter()
        dt = timeit(fn, *xs, reps=args.reps)
        wall = time.perf_counter() - t0
        print(f"  {name:<28}: {dt*1e3:9.1f} ms   {n/dt/1e6:8.1f} Mrow/s"
              f"   (compile+probe wall {wall:.0f}s)", flush=True)
        return dt

    # baseline: the k=127 hashed-dedupe sort layout (nk=3, 9 columns)
    probe(
        "flat 3k/9c",
        jax.jit(lambda *o: jax.lax.sort(o, num_keys=3)), *cols,
    )

    # batched segments, same layout
    for b in (16, 64, 147, 256, 588, 1024, 2352):
        if n % b:
            continue
        segs = tuple(c.reshape(b, n // b) for c in cols)
        probe(
            f"batched 3k/9c B={b} m={n//b}",
            jax.jit(lambda *s: jax.lax.sort(s, dimension=1, num_keys=3)),
            *segs,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
