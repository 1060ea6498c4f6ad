#!/usr/bin/env python
"""A/B microbenchmark of the Pallas kernels at bench shapes.

Compares, on the real device:
  * compact_flagged route=butterfly vs route=bitonic vs the XLA
    payload-sort compaction (compact_rows), at merge-pipeline shapes;
  * merge_sorted vs lax.sort on the same column layout.

Usage: python tools/kernelbench.py [--n 50331648] [--cols 4] [--platform cpu]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _force(out):
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    return jax.device_get(leaves[0].ravel()[0])


_BASE = 0.0  # null dispatch+fence latency (amortized timing)


def timeit(fn, *args, reps=3):
    """Dispatch `reps` async calls, fence once, subtract the null
    baseline — single fenced calls through the tunnel are latency-bound."""
    _force(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(reps)]
    _force(outs[-1])
    return max(0.0, time.perf_counter() - t0 - _BASE) / reps


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=(1 << 24) + (1 << 25))
    ap.add_argument("--cols", type=int, default=4,
                    help="payload columns (k=14 merge: key + 3 digits)")
    ap.add_argument("--density", type=float, default=0.45)
    ap.add_argument("--platform", default=None)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import functools

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from tsxcount_tpu.ops.count import compact_rows
    from tsxcount_tpu.ops.pallas_compact import compact_flagged

    global _BASE
    null = jax.jit(lambda x: x + 1)
    z = jax.device_put(jnp.zeros((8,), jnp.int32))
    _force(null(z))
    t0 = time.perf_counter()
    outs = [null(z) for _ in range(args.reps)]
    _force(outs[-1])
    _BASE = time.perf_counter() - t0

    n = args.n
    rng = np.random.default_rng(0)
    flag = jnp.asarray((rng.random(n) < args.density).astype(np.int32))
    cols = tuple(
        jnp.asarray(rng.integers(0, 2**31, size=n, dtype=np.int32))
        for _ in range(args.cols)
    )
    interp = jax.default_backend() != "tpu"

    results = {}
    for route in ("butterfly", "bitonic"):
        fn = jax.jit(functools.partial(
            compact_flagged, route=route, interpret=interp))
        results[f"compact_{route}"] = timeit(fn, flag, cols, reps=args.reps)

    xla_fn = jax.jit(lambda f, c: compact_rows(f != 0, c))
    results["compact_xla_sort"] = timeit(xla_fn, flag, cols, reps=args.reps)

    if not interp:
        from tsxcount_tpu.ops.pallas_merge import merge_sorted

        half = n // 2
        a = tuple(jnp.sort(c[:half].astype(jnp.uint32)) for c in cols[:1]) + tuple(
            c[:half] for c in cols[1:]
        )
        b = tuple(jnp.sort(c[half:].astype(jnp.uint32)) for c in cols[:1]) + tuple(
            c[half:] for c in cols[1:]
        )
        results["merge_sorted"] = timeit(
            jax.jit(functools.partial(merge_sorted, n_keys=1)), a, b,
            reps=args.reps,
        )
        results["lax_sort_same"] = timeit(
            jax.jit(lambda c: jax.lax.sort(
                (c[0].astype(jnp.uint32),) + c[1:], num_keys=1)),
            cols, reps=args.reps,
        )

        # fused merge+dedupe+compact vs the 3-pass pipeline it replaces
        # (merge_sorted -> flags/segsum -> compact_flagged), at store-merge
        # column layout: 1 key + (lo, hi) counts
        from tsxcount_tpu.ops.count import _segmented_sum_rev_u64
        from tsxcount_tpu.ops.pallas_merge_dedupe import merge_dedupe_sorted

        a3 = (a[0], cols[1][:half].astype(jnp.uint32),
              jnp.zeros((half,), jnp.int32))
        b3 = (b[0], cols[1][half:].astype(jnp.uint32),
              jnp.zeros((n - half,), jnp.int32))
        results["merge_dedupe_fused"] = timeit(
            jax.jit(functools.partial(
                merge_dedupe_sorted, n_keys=1, inv_min=1 << 31)),
            a3, b3, reps=args.reps,
        )

        def three_pass(a3, b3):
            merged = merge_sorted(a3, b3, n_keys=1)
            key = merged[0]
            neq = key[1:] != key[:-1]
            flag = jnp.concatenate([jnp.ones((1,), jnp.bool_), neq])
            lo, hi = _segmented_sum_rev_u64(merged[1], merged[2], flag, 2)
            return compact_flagged(
                flag.astype(jnp.int32), (key, lo, hi))

        results["merge_dedupe_3pass"] = timeit(
            jax.jit(three_pass), a3, b3, reps=args.reps,
        )

    print(f"platform={jax.default_backend()} n={n} cols={args.cols}")
    for name, dt in results.items():
        print(f"{name:>20}: {dt*1e3:9.1f} ms  {n/dt/1e6:10.1f} Melem/s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
