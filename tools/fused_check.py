#!/usr/bin/env python
"""Numeric check of the fused store-merge kernel against the 3-pass
pipeline ON HARDWARE, at real KmerSpec packings (multi-lane keys).

Interpret-mode tests pass for all n_keys; this catches Mosaic-lowering
divergences the interpreter can't see.

Usage: python tools/fused_check.py [--ks 14,31,63,127] [--cap 1048576]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="14,31,63,127")
    ap.add_argument("--cap", type=int, default=1 << 20)
    ap.add_argument("--p", type=int, default=1 << 18)
    ap.add_argument("--r", type=int, default=2)
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
    from tsxcount_tpu.core.store import CountStore

    interp = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)
    ok_all = True
    for k in (int(x) for x in args.ks.split(",")):
        spec = KmerSpec(k)
        lanes = spec.lanes
        store = CountStore(spec, capacity=args.cap)
        state = store.init_state()
        # pre-populate the store with one merge, then do a second merge
        # (exercises carry/invalid paths on a non-empty store)
        outs = {}
        for fused in (False, True):
            st = store.init_state()
            rng2 = np.random.default_rng(7)
            # fixed key pool so rounds share many keys (exercises the
            # store-vs-batch summing); each round's run is DEDUPED, the
            # merge contract (keys unique within one run)
            pool = np.random.default_rng(3).integers(
                0, 2**32, size=(2 * args.p, lanes), dtype=np.uint32
            )
            pool[:, -1] &= np.uint32(spec.top_lane_mask)
            pool = np.unique(pool, axis=0)
            for round_i in range(args.r):
                sel = rng2.choice(len(pool), size=args.p, replace=False)
                keys = pool[np.sort(sel)]
                order = np.lexsort(
                    tuple(keys[:, j] for j in range(lanes))
                )
                keys = keys[order]
                counts = rng2.integers(
                    1, 1000, size=args.p
                ).astype(np.int32)
                valid = np.ones(args.p, bool)
                valid[-args.p // 8 :] = False
                st = store._merge_stacked_pallas(
                    st, jnp.asarray(keys)[None],
                    jnp.asarray(counts)[None], jnp.asarray(valid)[None],
                    interpret=interp, fused=fused,
                )
            outs[fused] = jax.device_get(st)
        a, b = outs[False], outs[True]
        n_a, n_b = int(a.n), int(b.n)
        same_n = n_a == n_b
        same_keys = same_n and bool(
            np.array_equal(a.keys[:n_a], b.keys[:n_b])
        )
        same_digits = same_n and bool(
            np.array_equal(a.digits[:n_a], b.digits[:n_b])
        )
        ovf = (bool(a.overflowed), bool(b.overflowed))
        ok = same_n and same_keys and same_digits and ovf[0] == ovf[1]
        ok_all &= ok
        print(f"k={k:<4} lanes={lanes} n_3pass={n_a} n_fused={n_b} "
              f"keys_eq={same_keys} digits_eq={same_digits} ovf={ovf} "
              f"{'OK' if ok else 'MISMATCH'}")
        if not ok and same_n:
            d = np.flatnonzero(
                ~(a.keys[:n_a] == b.keys[:n_a]).all(axis=1)
            )
            print(f"  first key mismatch rows: {d[:5]}")
            dd = np.flatnonzero(
                ~(a.digits[:n_a] == b.digits[:n_a]).all(axis=1)
            )
            print(f"  first digit mismatch rows: {dd[:5]}")
    return 0 if ok_all else 1


if __name__ == "__main__":
    sys.exit(main())
