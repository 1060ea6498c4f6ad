#!/usr/bin/env python
"""QuotientTable insert decomposition — where do 12 s/batch go? (VERDICT
r3 #7: table backend at 781k kmers/s = 1.2% of the sort backend.)

Times, amortized (async dispatches, one fence, null baseline subtracted):
  * full insert of one realistic deduped batch (the production shape);
  * the per-round claims sort alone (2 ops, full batch);
  * one scatter round alone (digits.add + keys.set + used.set);
  * insert round count for this batch (fill-driven);
  * insert at HALF batch rows (the n_unique prefix idea: the deduped
    batch is compacted, so rows beyond n_unique are dead weight).

Usage: python tools/tablebench.py [--k 14] [--l 26] [--reps 3]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=14)
    ap.add_argument("--l", type=int, default=26)
    ap.add_argument("--n", type=int, default=602112 * 16)
    ap.add_argument("--unique-frac", type=float, default=0.3,
                    help="fraction of rows valid+unique (real k=14 ~0.3)")
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

    from tsxcount_tpu.config import KmerSpec
    from tsxcount_tpu.core.table import QuotientTable, _triangular
    from tsxcount_tpu.ops.gf2 import GF2Hash

    spec = KmerSpec(args.k)
    table = QuotientTable(spec, args.l, GF2Hash(spec))
    n = args.n
    rng = np.random.default_rng(0)
    n_u = int(n * args.unique_frac)
    ukeys = np.zeros((n, spec.lanes), np.uint32)
    ukeys[:n_u] = rng.integers(0, 2**32, size=(n_u, spec.lanes),
                               dtype=np.uint32)
    ukeys[:n_u, -1] &= np.uint32(spec.top_lane_mask)
    ucounts = np.ones(n, np.int32)
    uvalid = np.arange(n) < n_u

    def fence(x):
        leaves = jax.tree_util.tree_leaves(x)
        jax.device_get(leaves[0].ravel()[0])

    null = jax.jit(lambda x: x + 1)
    z = jax.device_put(jnp.zeros((8,), jnp.int32))
    fence(null(z))
    t0 = time.perf_counter()
    outs = [null(z) for _ in range(args.reps)]
    fence(outs[-1])
    base = time.perf_counter() - t0
    print(f"platform={jax.default_backend()} n={n} n_unique={n_u} "
          f"l={args.l} (null {base/args.reps*1e3:.2f} ms/call)")

    ukeys_d = jnp.asarray(ukeys)
    ucounts_d = jnp.asarray(ucounts)
    uvalid_d = jnp.asarray(uvalid)

    # NB: STANDALONE tiny jits over [slots, few] state arrays at l=26 can
    # make XLA pick a (8,128)-tiled layout (minor dim padded to 128 =
    # 25x inflation, 32 GiB, compile-time OOM).  Build ONE jit per
    # program and reuse it (each fresh jax.jit wrapper re-negotiates
    # layouts); bench the single-program insert only at l <= 24.
    st = table.init_state()
    phase1j = jax.jit(table.insert_phase1)
    phase2j = jax.jit(table.insert_phase2)
    if args.l <= 24:
        insert = jax.jit(table.insert)
        out = insert(st, ukeys_d, ucounts_d, uvalid_d)
    else:
        mid, r1_, un_ = phase1j(st, ukeys_d, ucounts_d, uvalid_d)
        out = phase2j(mid, ukeys_d, ucounts_d, un_, r1_)
    fence(out.n)
    hist = np.asarray(jax.device_get(out.probe_hist))
    rounds = int(np.nonzero(hist)[0].max()) + 1 if hist.any() else 0
    print(f"  insert rounds used      : {rounds} "
          f"(hist head {hist[:8].tolist()})")

    def timed(label, fn, *fargs, reps=args.reps):
        fence(fn(*fargs))
        t0 = time.perf_counter()
        outs = [fn(*fargs) for _ in range(reps)]
        fence(outs[-1])
        dt = (time.perf_counter() - t0 - base) / reps
        print(f"  {label:24}: {dt*1e3:9.1f} ms")
        return dt

    # full insert into an EMPTY table each call (state not donated here so
    # the same input state can repeat)
    if args.l <= 24:
        timed("insert (empty table)",
              lambda: insert(st, ukeys_d, ucounts_d, uvalid_d))

    # the r4 production path: phase1 (full-width rounds until the residue
    # fits 1/8) + phase2 (compact + residue-width rounds), two dispatches
    def split_insert():
        mid, r1, unres = phase1j(st, ukeys_d, ucounts_d, uvalid_d)
        # fence on the scalar: .ravel() of the [slots, cols] state inside
        # the fence helper is itself a standalone reshape program — and
        # tiles the array (the layout hazard, a third sighting)
        return phase2j(mid, ukeys_d, ucounts_d, unres, r1).n

    timed("insert split-phase", split_insert)

    # claims sort alone at full width
    idx = jnp.arange(n, dtype=jnp.int32)
    pos = jnp.asarray(rng.integers(0, table.slots, size=n, dtype=np.int64)
                      .astype(np.int32))
    ckey = jnp.where(uvalid_d, pos, table.slots).astype(jnp.uint32)
    timed("claims sort (2 ops)",
          jax.jit(lambda c, i: jax.lax.sort((c, i), num_keys=2)), ckey, idx)

    # one combined-row 2-D scatter round alone (the r4 formulation the
    # residue_phase still uses; r3 three-array scatters were 901 ms)
    cols = table.slot_cols
    row_vals = jnp.asarray(
        rng.integers(0, 3, size=(n, cols), dtype=np.uint32)
    )

    def scatter_round(slots_flat, posx):
        safe = jnp.where(uvalid_d, posx, table.slots + idx)
        s2d = slots_flat.reshape(table.slots, cols)
        res = s2d.at[safe].add(row_vals, mode="drop", unique_indices=True)
        return res[0, 0]  # scalar: keep the fence off the big array

    timed("scatter round (2-D)", jax.jit(scatter_round), out.slots, pos)

    # gather round alone (combined-row read at probe positions, 2-D view)
    def gather_round(slots_flat, posx):
        return jnp.sum(slots_flat.reshape(table.slots, cols)[posx][:, 0])

    timed("gather round (2-D)", jax.jit(gather_round), out.slots, pos)

    # the r5 split flow, one full batch (sorted_round + kernel apply x2
    # + residue_phase) with host width sync, as the counter drives it
    from tests.test_table import _split_insert

    def split_sorted():
        return _split_insert(
            table, st, ukeys_d, ucounts_d, uvalid_d, "kernel"
        ).n

    timed("insert split-sorted(kernel)", split_sorted, reps=args.reps)

    # insert with rows sliced to the unique prefix (half batch);
    # single-program insert only below the layout-hazard size
    if args.l <= 24:
        half = n // 2
        insert_half = jax.jit(
            lambda s: table.insert(s, ukeys_d[:half], ucounts_d[:half],
                                   uvalid_d[:half]).n
        )
        timed("insert (P/2 rows)", insert_half, st)
    return 0


if __name__ == "__main__":
    sys.exit(main())
