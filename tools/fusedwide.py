#!/usr/bin/env python
"""A/B the wide-key (n_keys=8, k=127) fused store merge vs the 3-pass
path across kernel tiles (VERDICT r4 #7).

r3 measured the fused kernel LOSING at n_keys=8 (k=127: 0.845 vs 0.620
s/pass) with the default tile (2^14).  Hypothesis: the bitonic-merge
network's live copies (11 columns x 4*tile elements x 2-3 generations)
overflow Mosaic's vector budget at wide keys and spill; a smaller tile
may restore the win.  This probes the production entry point
(CountStore._reduce_runs_pallas) at k=127 bench-like shapes.

Usage: python tools/fusedwide.py [--cap 8388608] [--p 4194304]
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
    ap.add_argument("--cap", type=int, default=1 << 23)
    ap.add_argument("--p", type=int, default=1 << 22)
    ap.add_argument("--k", type=int, default=127)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tiles", default="16384,8192,4096,2048")
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

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.core.store import CountStore, StoreState
    from tsxcount_tpu.ops.count import int32_to_digits

    spec = KmerSpec(args.k)
    lanes = spec.lanes
    store = CountStore(spec, capacity=args.cap)
    rng = np.random.default_rng(0)

    def sorted_keys(n, used_frac=0.75):
        """Ascending multi-lane keys, unique, valid prefix only."""
        n_used = int(n * used_frac)
        top = np.sort(
            rng.integers(0, spec.top_lane_mask, size=n_used, dtype=np.uint64)
        ).astype(np.uint32)
        keys = rng.integers(0, 2**32, size=(n, lanes), dtype=np.uint32)
        keys[:n_used, -1] = top
        # break top-lane ties deterministically: ascending second lane
        keys[:n_used, -2] = np.sort(
            keys[:n_used, -2].astype(np.uint64)
        ).astype(np.uint32)
        keys[n_used:] = 0
        used = np.zeros(n, bool)
        used[:n_used] = True
        return keys, used, n_used

    skeys, sused, s_n = sorted_keys(args.cap)
    state = StoreState(
        keys=jnp.asarray(skeys),
        digits=jnp.asarray(
            int32_to_digits(jnp.asarray(
                rng.integers(1, 1000, size=args.cap).astype(np.int32)
            ))
        ) * jnp.asarray(sused)[:, None].astype(jnp.int32),
        used=jnp.asarray(sused),
        n=jnp.asarray(s_n, jnp.int32),
        overflowed=jnp.zeros((), jnp.bool_),
    )
    bkeys, bused, _ = sorted_keys(args.p)
    ukeys = jnp.asarray(bkeys)[None]
    ucounts = jnp.asarray(
        rng.integers(1, 100, size=args.p).astype(np.int32)
    )[None]
    uvalid = jnp.asarray(bused)[None]

    global _BASE
    null = jax.jit(lambda x: x + 1)
    z = jax.device_put(jnp.zeros((8,), jnp.int32))
    fence(null(z))
    t0 = time.perf_counter()
    outs = [null(z) for _ in range(args.reps)]
    fence(outs[-1])
    _BASE = time.perf_counter() - t0
    n_keys = lanes if spec.top_lane_bits < 32 else lanes + 1
    print(f"platform={jax.default_backend()} k={args.k} n_keys={n_keys} "
          f"cap={args.cap} p={args.p} "
          f"(null baseline {_BASE/args.reps*1e3:.2f} ms/call)", flush=True)

    def probe(name, fused, tile):
        interp = jax.default_backend() != "tpu"
        fn = jax.jit(
            lambda st, uk, uc, uv: store._merge_stacked_pallas(
                st, uk, uc, uv, tile=tile, fused=fused, interpret=interp
            )
        )
        try:
            t0 = time.perf_counter()
            dt = timeit(fn, state, ukeys, ucounts, uvalid, reps=args.reps)
        except Exception as e:  # noqa: BLE001
            print(f"  {name:<26}: FAILED {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            return
        wall = time.perf_counter() - t0
        print(f"  {name:<26}: {dt*1e3:9.1f} ms   (wall {wall:.0f}s)",
              flush=True)

    for tile in (int(t) for t in args.tiles.split(",")):
        probe(f"fused tile={tile}", True, tile)
    for tile in (16384, 8192):
        probe(f"3pass tile={tile}", False, tile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
