#!/usr/bin/env python
"""Probe: does packing uint32 lane pairs into uint64 sort operands beat
the 8-column uint32 dedupe sort?  lax.sort on TPU is COLUMN-MOVEMENT
bound (tools/sortbench.py r4), so 4 u64 columns may move cheaper than 8
u32 columns even though XLA emulates 64-bit as pairs.

Also probes the marginal column cost (k columns at fixed rows) and the
k=127 real layout: nk=3/8c u32 vs nk=2/4c u64 (64-bit uniform prefix in
ONE u64 column + 3 payload u64) — and the pack/unpack overhead.

Usage: python tools/u64probe.py [--n 9633792] [--reps 3]
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

    jax.config.update("jax_enable_x64", True)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    n = args.n
    rng = np.random.default_rng(0)
    cols32 = [
        jnp.asarray(rng.integers(0, 2**32, size=n, dtype=np.uint32))
        for _ in range(8)
    ]
    cols64 = [
        jnp.asarray(rng.integers(0, 2**63, size=n, dtype=np.uint64))
        for _ in range(4)
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
        try:
            dt = timeit(fn, *xs, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:<28}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return None
        wall = time.perf_counter() - t0
        print(f"  {name:<28}: {dt*1e3:9.1f} ms   {n/dt/1e6:8.1f} Mrow/s"
              f"   (compile+probe wall {wall:.0f}s)", flush=True)
        return dt

    # the real k=127 layout baseline: 3 keys / 8 cols u32
    probe("u32 3k/8c (k127 today)",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=3)), *cols32)
    # u64 twins
    probe("u64 2k/4c (k127 packed)",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=2)), *cols64)
    probe("u64 1k/4c",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=1)), *cols64)
    probe("u64 4k/4c",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=4)), *cols64)
    # marginal column cost at u32
    probe("u32 3k/4c",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=3)), *cols32[:4])
    # k=63 today (4 lanes u32) vs packed (2 u64)
    probe("u32 4k/4c (k63 today)",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=4)), *cols32[:4])
    probe("u64 2k/2c (k63 packed)",
          jax.jit(lambda *o: jax.lax.sort(o, num_keys=2)), *cols64[:2])
    # end-to-end with pack/unpack overhead: 8 u32 -> 4 u64 -> sort -> 8 u32
    def packed_sort(*c32):
        c64 = tuple(
            (c32[2 * i].astype(jnp.uint64) << 32)
            | c32[2 * i + 1].astype(jnp.uint64)
            for i in range(4)
        )
        s = jax.lax.sort(c64, num_keys=2)
        out = []
        for c in s:
            out.append((c >> 32).astype(jnp.uint32))
            out.append(c.astype(jnp.uint32))
        return tuple(out)

    probe("u64 pack+sort+unpack", jax.jit(packed_sort), *cols32)
    return 0


if __name__ == "__main__":
    sys.exit(main())
