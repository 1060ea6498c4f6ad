"""Quotient/reprobe hash table — the jellyfish-style backend, TPU-native.

Semantics mirror the reference table (reference src/tsxcount/TSXHashMap.h):

  * slot index for reprobe attempt r is (hash mod 2^L + r(r+1)/2) mod 2^L —
    triangular reprobing (`reprobe` TSXHashMap.h:1046-1054, `getPosition`
    759-778);
  * a slot stores [func bits | reprobe] where func = hash >> L, so the low L
    bits of the hash are *recoverable from the slot index* (`makeKey`
    TSXHashMap.h:1056-1072, reconstruction 683-712); with the bijective GF(2)
    hash this makes the whole k-mer reconstructible from the table
    (`getAllKmers` 660-722);
  * counts are exact and unbounded (3 base-2^20 digits replace the s-bit
    value + overflow-chain encoding of TSXHashMap.h:1311-1451 — same
    observable counts, no chain walk).

What is deliberately *not* mirrored: the serialization machinery.  Where the
reference arbitrates concurrent slot claims with TSX transactions / CAS /
locks, this table resolves an entire deduplicated batch per round with a
deterministic scatter-min claim: every contender writes its index, the
minimum wins the slot, losers re-probe next round.  Conflict-free,
deterministic, and batched — no retries on shared memory.

One intentional deviation: reprobe indices are 0-based here (the reference
starts iReprobes at 1, TSXHashMap.h:189); the encoding stays self-consistent
and reconstruction-exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tsxcount_tpu.config import (
    COUNT_DIGIT_BITS,
    COUNT_DIGIT_MASK,
    COUNT_DIGITS,
    KmerSpec,
    counts_to_int,
)
from tsxcount_tpu.ops.count import int32_to_digits, renorm_digits
from tsxcount_tpu.ops.gf2 import GF2Hash
from tsxcount_tpu.ops.lanes import keys_equal


class TableState(NamedTuple):
    # ONE combined slot array (r4), stored FLAT (r5): row i's columns
    # [key lanes | 3 count digits (int32 bitcast into uint32 lanes) |
    # used flag] occupy elements [i*C, (i+1)*C).  The r3 layout kept
    # keys/digits/used as three arrays (three gathers + three scatters
    # per reprobe round, 901 ms of a 1.1 s round); r4 fused the row into
    # one [slots, C] array; r5 flattened it after a FOURTH sighting of
    # the (8,128)-layout trap — XLA gave the [2^26, 5] array a tiled
    # layout with the minor dim padded 5 -> 128 inside the new sorted-
    # round program (a 32 GiB copy, compile-time OOM).  A 1-D array has
    # no minor dim to pad: the hazard is gone BY CONSTRUCTION.  Rounds
    # gather/scatter rows as C-element slices (lax.gather/scatter_add
    # with slice_sizes=(C,)); the Pallas apply kernel consumes the flat
    # array directly.  Semantics unchanged: key = (func << L) | reprobe
    # (TSXHashMap.h makeKey analog), used is the m_iKmerStarts analog.
    slots: jax.Array   # uint32 [slots * (lanes + COUNT_DIGITS + 1)]
    n: jax.Array       # int32 scalar: distinct kmers
    spilled: jax.Array # int32 scalar: kmers dropped after max reprobes
    probe_hist: jax.Array  # int32 [max_reprobes]: kmers resolved at round r
                           # (the abort-code histogram analog,
                           # reference TSXHashMapTSXPerf.h:195-239)


def _bitcast_u32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


def _bitcast_i32(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x, jnp.int32)


def _triangular(r: jax.Array) -> jax.Array:
    return (r * (r + 1)) // 2


class QuotientTable:
    """2^L-slot reprobing table over GF(2)-hashed multi-lane keys."""

    def __init__(self, spec: KmerSpec, l_bits: int, hash_fn: GF2Hash,
                 max_reprobes: int = 64):
        if not 1 <= l_bits <= 31:
            raise ValueError("l_bits must be in [1, 31]")
        if 2 * spec.k <= l_bits:
            raise ValueError(
                f"2k={2*spec.k} must exceed l={l_bits} (func field would be empty)"
            )
        self.spec = spec
        self.l_bits = l_bits
        self.slots = 1 << l_bits
        self.hash_fn = hash_fn
        # reference max = 2^L - 1 (TSXHashMap.h:86); we bound the while loop
        self.max_reprobes = min(max_reprobes, self.slots - 1)
        self._low_mask = jnp.uint32((1 << l_bits) - 1)
        # sorted-apply rounds (r5, VERDICT r4 #2): rows ride each round in
        # slot-sorted order, so the slot update is sorted+unique and can
        # run as a linear Pallas sweep (ops/pallas_apply.py) instead of a
        # per-row XLA scatter, and winner arbitration needs no bool
        # scatter back to original order.  Needs pos*cols*2 to fit int32
        # (flat doubled element destinations) and pos|flag packing in 30
        # bits; larger tables keep the legacy rounds.
        self.sorted_rounds = (
            2 * self.slots * self.slot_cols < 2**31 and l_bits < 30
        )

    @property
    def slot_cols(self) -> int:
        """Columns of the combined slot array: key lanes + digits + used."""
        return self.spec.lanes + COUNT_DIGITS + 1

    def init_state(self) -> TableState:
        return TableState(
            slots=jnp.zeros((self.slots * self.slot_cols,), jnp.uint32),
            n=jnp.zeros((), jnp.int32),
            spilled=jnp.zeros((), jnp.int32),
            probe_hist=jnp.zeros((self.max_reprobes,), jnp.int32),
        )

    # --- combined-row views (2-D reshapes: host/export/debug paths ONLY —
    #     a [slots, few] array inside a TPU hot program risks the (8,128)
    #     padded layout; hot paths use the flat slice gather/scatter) ----

    def state_keys(self, state: TableState) -> jax.Array:
        """uint32 [slots, lanes] slot keys ((func << L) | reprobe)."""
        return state.slots.reshape(self.slots, self.slot_cols)[
            :, : self.spec.lanes
        ]

    def state_digits(self, state: TableState) -> jax.Array:
        """int32 [slots, 3] count digits."""
        lanes = self.spec.lanes
        return _bitcast_i32(
            state.slots.reshape(self.slots, self.slot_cols)[
                :, lanes : lanes + COUNT_DIGITS
            ]
        )

    def state_used(self, state: TableState) -> jax.Array:
        """bool [slots] — the m_iKmerStarts analog."""
        return state.slots.reshape(self.slots, self.slot_cols)[:, -1] != 0

    def _gather_rows(self, slots_flat: jax.Array, pos: jax.Array
                     ) -> jax.Array:
        """Combined rows [N, C] at slot indices `pos` from the FLAT array
        — one gather of C-element slices (XLA lowers it like the r4 row
        gather, no 2-D operand anywhere)."""
        cols = self.slot_cols
        return jax.lax.gather(
            slots_flat,
            (pos.astype(jnp.int32) * cols)[:, None],
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1,), collapsed_slice_dims=(),
                start_index_map=(0,),
            ),
            slice_sizes=(cols,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )

    def _renormed2d(self, slots2d: jax.Array) -> jax.Array:
        """Digit renormalization on the 2-D combined-row view (base-2^20
        carry propagation — the r3 overflow-chain analog,
        TSXHashMap.h:1501-1623).  2-D-form programs only."""
        lanes = self.spec.lanes
        digits = _bitcast_i32(
            slots2d[:, lanes : lanes + COUNT_DIGITS]
        )
        return jax.lax.dynamic_update_slice(
            slots2d, _bitcast_u32(renorm_digits(digits)), (0, lanes)
        )

    def _renorm_flat(self, slots_flat: jax.Array) -> jax.Array:
        """Base-2^20 digit renormalization directly on the flat array.

        Digit d_j of slot i lives at element i*C + lanes + j; carries
        propagate d0 -> d1 -> d2 with two shift-by-one adds gated by
        element-offset masks — pure elementwise work, no [slots, few]
        array (the r3 overflow-chain analog, TSXHashMap.h:1501-1623).
        """
        cols = self.slot_cols
        lanes = self.spec.lanes
        total = slots_flat.shape[0]
        off = jnp.arange(total, dtype=jnp.int32) % cols
        is_d0 = off == lanes
        is_d1 = off == lanes + 1
        d = _bitcast_i32(slots_flat)
        mask = jnp.int32(COUNT_DIGIT_MASK)

        def carry_step(dd, is_src):
            carry = jnp.where(is_src, dd >> COUNT_DIGIT_BITS, 0)
            dd = jnp.where(is_src, dd & mask, dd)
            shifted = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32), carry[:-1]]
            )
            return dd + shifted

        d = carry_step(d, is_d0)
        d = carry_step(d, is_d1)
        digit_pos = is_d0 | is_d1 | (off == lanes + 2)
        return jnp.where(digit_pos, _bitcast_u32(d), slots_flat)

    def _hash_parts(self, ukeys: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Returns (pos0 int32 [P], cleared hash lanes uint32 [P, lanes]).

        cleared = hash with the low L bits zeroed = (func << L); OR-ing the
        reprobe count into lane 0 yields the stored slot key (makeKey analog).
        """
        h = self.hash_fn.apply(ukeys)
        pos0 = (h[:, 0] & self._low_mask).astype(jnp.int32)
        cleared = h.at[:, 0].set(h[:, 0] & ~self._low_mask)
        return pos0, cleared

    def _round_body(self, pos0, cleared, add_digits):
        """One batched reprobe round over rows (pos0, cleared, add_digits)
        — shape-generic (full batch or the compacted residue).

        Deterministic claim, scatter-free arbitration: sort contenders by
        (slot, row); the first row of each slot run wins.  O(P log P) on
        the batch instead of an O(2^L) claims array, and the map back to
        row order is a permutation scatter.  Same semantics as the
        reference's CAS arbitration (TSXHashMapCAS.h:268-508): exactly one
        contender claims a slot, losers re-probe.

        The slot update is ONE scatter-ADD of the combined row (r4;
        scatters cost per row on TPU — 901 ms of a 1.1 s r3 round were the
        three separate key/digit/used scatters): a winner's slot holds
        zeros, so adding [slotkey | add_digits | 1] IS the claim; a
        match's row adds [0 | add_digits | 0] so key and used are
        untouched.  Indices are provably unique (winner slots distinct,
        match slots are distinct keys, a winner and a match can never
        target the same slot — one needs it empty, the other used; every
        non-updated row gets a distinct out-of-bounds index s+i that
        drops), so XLA vectorizes the scatter.
        """
        p = pos0.shape[0]
        s = self.slots
        lanes = cleared.shape[1]
        idx_arr = jnp.arange(p, dtype=jnp.int32)
        add_u32 = _bitcast_u32(add_digits)

        def body(carry):
            r, unresolved, slots, n, hist = carry
            pos = (pos0 + _triangular(r)) % s
            slotkey = cleared.at[:, 0].set(
                cleared[:, 0] | jnp.uint32(r)
            )
            g = slots[pos]  # ONE row gather of the combined 2-D view
            key_g = g[:, :lanes]
            used_g = g[:, -1] != 0
            match = unresolved & used_g & keys_equal(key_g, slotkey)
            empty = unresolved & ~used_g
            ckey = jnp.where(empty, pos, s).astype(jnp.uint32)
            ckey_s, idx_s = jax.lax.sort((ckey, idx_arr), num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), ckey_s[1:] != ckey_s[:-1]]
            )
            win_s = first & (ckey_s < s)
            winner = jnp.zeros((p,), jnp.bool_).at[idx_s].set(
                win_s, unique_indices=True
            )
            upd = match | winner
            row = jnp.concatenate(
                [
                    jnp.where(winner[:, None], slotkey, jnp.uint32(0)),
                    add_u32,
                    winner.astype(jnp.uint32)[:, None],
                ],
                axis=1,
            )
            safe_upd = jnp.where(upd, pos, s + idx_arr)
            slots = slots.at[safe_upd].add(
                row, mode="drop", unique_indices=True
            )
            n = n + jnp.sum(winner.astype(jnp.int32))
            hist = jax.lax.dynamic_update_index_in_dim(
                hist, hist[r] + jnp.sum(upd.astype(jnp.int32)), r, axis=0
            )
            return r + 1, unresolved & ~upd, slots, n, hist

        return body

    # --- split flat rounds (r5) ---------------------------------------------
    #
    # VERDICT r4 #2 rebuilt around hardware measurements (r5, one v5e):
    #   * XLA row scatter on the [2^26, 5] view: 765 ms / 9.6M-row round;
    #   * XLA flat slice gather/scatter (slice_sizes=(C,)): 16.6 / 21.5 s;
    #   * ANY materialized [slots, few] array inside a program — a
    #     reshape or layout copy — can get the (8,128)-tiled layout with
    #     the minor dim padded to 128 (25x HBM, 32 GiB at l=26): three
    #     sightings this round alone;
    #   * the Pallas butterfly sweeps over the FLAT array: ~47 ms.
    #
    # So the hot path never leaves the flat 1-D form.  split_round runs
    # one full reprobe round as ONE program: stable sort by probed slot,
    # sweep-GATHER of run-head slot rows (ops/pallas_apply.py
    # gather_sorted) + an OR-scan fill-forward within runs, arbitration
    # (winner = LAST contender of its run — arbitrary-but-deterministic,
    # like the reference's "whoever wins the transaction",
    # TSXHashMapCAS.h:268-508), and the sweep-APPLY of one combined add-
    # row per resolved contender.  The unresolved set stays in sorted
    # order (no bool scatter back); each round's sort pushes previously
    # resolved rows to the tail, so after round 1 the actives occupy a
    # prefix whose size round 1 reports — the host then finishes in
    # residue_phase at the narrowest pow2 width with flat element
    # gathers/scatters (fast at small widths).

    def split_round(self, state: TableState, r: int, pos0, cleared,
                    counts, active, mode: str = "kernel"):
        """One full-width reprobe round at static index `r` (flat form).

        Returns (state', carry=(pos0_s, cleared_s, counts_s,
        active_next), n_enter, n_left) with row arrays permuted by this
        round's slot sort; the actives all sit in the first n_enter
        positions (this round's sort pushed earlier-resolved rows to the
        tail), and n_left of them remain active — the host slices the
        next round's width from it.  mode: "kernel" (Pallas sweeps;
        interpret off-TPU) or "element" (flat element gather/scatter —
        small widths).
        """
        s = self.slots
        lanes = self.spec.lanes
        cols = self.slot_cols
        width = pos0.shape[0]
        inactive = jnp.uint32(0xFFFFFFFF)
        pos = (pos0 + _triangular(jnp.int32(r))) % s
        ckey = jnp.where(active, pos.astype(jnp.uint32), inactive)
        ops = (ckey, pos0, counts) + tuple(
            cleared[:, j] for j in range(lanes)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1, is_stable=True)
        ckey_s, pos0_s, counts_s = sorted_ops[:3]
        cleared_s = jnp.stack(sorted_ops[3:], axis=1)
        active_s = ckey_s != inactive
        pos_s = ckey_s.astype(jnp.int32)
        boundary = ckey_s[1:] != ckey_s[:-1]
        run_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), boundary]
        )
        run_end = jnp.concatenate(
            [boundary, jnp.ones((1,), jnp.bool_)]
        )
        base = jnp.where(active_s, pos_s, 0) * cols
        ec = jnp.arange(cols, dtype=jnp.int32)
        head_live = active_s & run_start

        # --- slot contents for every row: gather heads, fill forward ---
        if mode == "kernel":
            from tsxcount_tpu.ops.pallas_apply import gather_sorted

            dst2g = jnp.where(
                active_s[:, None],
                jnp.where(
                    head_live[:, None],
                    ((base[:, None] + ec[None, :]) << 1) | 1,
                    # non-head rows: one even value past the head row's
                    # last element, before the next run's first
                    ((base + cols) << 1)[:, None] + (ec[None, :] * 0),
                ),
                jnp.int32(1 << 30),
            ).reshape(width * cols)
            g_flat, over_g = gather_sorted(
                state.slots, dst2g, u_win=self._sweep_win(width),
                interpret=jax.default_backend() != "tpu",
            )
            g = g_flat.reshape(width, cols)
        else:
            idxe = jnp.where(
                head_live[:, None],
                base[:, None] + ec[None, :],
                s * cols,  # clipped read of a junk element, masked below
            ).reshape(width * cols)
            g = jnp.take(
                state.slots, idxe, mode="clip"
            ).reshape(width, cols)
            g = jnp.where(head_live[:, None], g, jnp.uint32(0))
            over_g = jnp.zeros((), jnp.int32)

        def fill_forward(col):
            # runs are contiguous and only the head row is nonzero, so a
            # boundary-blocked OR-scan broadcasts the head value down
            x, f = col, run_start
            d = 1
            while d < width:
                x_s = jnp.concatenate(
                    [jnp.zeros((d,), x.dtype), x[:-d]]
                )
                f_s = jnp.concatenate(
                    [jnp.ones((d,), jnp.bool_), f[:-d]]
                )
                x = x | jnp.where(f, jnp.zeros((), x.dtype), x_s)
                f = f | f_s
                d *= 2
            return x

        used_s = fill_forward(g[:, cols - 1]) != 0
        ru = jnp.uint32(r)
        slotkey0_s = cleared_s[:, 0] | ru
        key_eq = fill_forward(g[:, 0]) == slotkey0_s
        for j in range(1, lanes):
            key_eq = key_eq & (fill_forward(g[:, j]) == cleared_s[:, j])
        match_s = active_s & used_s & key_eq
        contend_s = active_s & ~used_s
        winner = contend_s & run_end
        resolved = match_s | winner

        # --- one combined add-row per resolved contender ---
        slotkey_s = cleared_s.at[:, 0].set(slotkey0_s)
        digits_s = int32_to_digits(counts_s)
        vals = jnp.concatenate([
            jnp.where(winner[:, None], slotkey_s, jnp.uint32(0)),
            _bitcast_u32(digits_s),
            winner.astype(jnp.uint32)[:, None],
        ], axis=1).reshape(width * cols)
        if mode == "kernel":
            from tsxcount_tpu.ops.pallas_apply import apply_sorted_unique

            dst2a = jnp.where(
                active_s[:, None],
                jnp.where(
                    resolved[:, None],
                    ((base[:, None] + ec[None, :]) << 1) | 1,
                    # dead rows collapse to the run's first even value —
                    # sorted regardless of where the live row sits
                    (base << 1)[:, None] + (ec[None, :] * 0),
                ),
                jnp.int32(1 << 30),
            ).reshape(width * cols)
            slots, over_a = apply_sorted_unique(
                state.slots, dst2a, vals,
                u_win=self._sweep_win(width),
                interpret=jax.default_backend() != "tpu",
            )
        else:
            safe = jnp.where(
                resolved, pos_s,
                s + jnp.arange(width, dtype=jnp.int32),
            )
            eidx = (safe[:, None] * cols + ec[None, :]).reshape(-1)
            slots = state.slots.at[eidx].add(
                vals, mode="drop", unique_indices=True
            )
            over_a = jnp.zeros((), jnp.int32)

        hist = jax.lax.dynamic_update_index_in_dim(
            state.probe_hist,
            state.probe_hist[r] + jnp.sum(resolved.astype(jnp.int32)),
            r, axis=0,
        )
        new_state = TableState(
            slots=slots,
            n=state.n + jnp.sum(winner.astype(jnp.int32)),
            # a window overflow would have read a zero slot row (a silent
            # false-empty): count it as spill so finish() raises loudly
            spilled=state.spilled + over_g + over_a,
            probe_hist=hist,
        )
        active_next = active_s & ~resolved
        n_left = jnp.sum(active_next.astype(jnp.int32))
        # compact the surviving rows to an exact prefix so the host can
        # slice the next round's width to the pow2 bucket of n_left
        carry_cols = (pos0_s, counts_s) + tuple(
            cleared_s[:, j] for j in range(lanes)
        )
        if mode == "kernel" and width % 1024 == 0:
            from tsxcount_tpu.ops.pallas_compact import compact_flagged

            comp = compact_flagged(
                active_next.astype(jnp.int32), carry_cols,
                interpret=jax.default_backend() != "tpu",
            )
            comp = [c[:width] for c in comp]
        else:
            ckey2 = jnp.where(
                active_next, jnp.arange(width, dtype=jnp.int32), width
            )
            out = jax.lax.sort(
                (ckey2,) + carry_cols, num_keys=1, is_stable=True
            )
            comp = list(out[1:])
        active_c = jnp.arange(width, dtype=jnp.int32) < n_left
        carry = (
            comp[0], jnp.stack(comp[2:], axis=1), comp[1], active_c,
        )
        return (new_state, carry, jnp.sum(active.astype(jnp.int32)),
                n_left)

    def _sweep_win(self, width: int) -> int:
        """pow2 update-window elements for the sweep kernels: >= 4x the
        mean per-tile run (hash-uniform -> overflow probability ~0)."""
        total = self.slots * self.slot_cols
        t_tiles = max(1, total // min(total, 1 << 17))
        mean = width * self.slot_cols // t_tiles
        u_win = 1024
        while u_win < 4 * mean + 2048:
            u_win *= 2
        return u_win

    def residue_phase(self, state: TableState, carry, r_start: int,
                      width2: int) -> TableState:
        """Finish an insert from the sorted carry at a narrow static
        width (flat element gathers/scatters — fast at small widths) and
        renormalize.  Rows active beyond the slice are counted spilled —
        impossible when width2 covers round r_start-1's reported
        entering-actives."""
        s = self.slots
        lanes = self.spec.lanes
        cols = self.slot_cols
        pos0_f, cleared_f, counts_f, active_f = carry
        lost = (
            jnp.sum(active_f.astype(jnp.int32))
            - jnp.sum(active_f[:width2].astype(jnp.int32))
        )
        pos0 = pos0_f[:width2]
        cleared = cleared_f[:width2]
        counts = counts_f[:width2]
        add_u32 = _bitcast_u32(int32_to_digits(counts))
        idx_arr = jnp.arange(width2, dtype=jnp.int32)
        ec = jnp.arange(cols, dtype=jnp.int32)

        def body(carry2):
            r, unresolved, slots, n, hist = carry2
            pos = (pos0 + _triangular(r)) % s
            slotkey = cleared.at[:, 0].set(
                cleared[:, 0] | r.astype(jnp.uint32)
            )
            eidx = (pos[:, None] * cols + ec[None, :]).reshape(-1)
            g = jnp.take(slots, eidx, mode="clip").reshape(width2, cols)
            used_g = g[:, -1] != 0
            match = unresolved & used_g & keys_equal(
                g[:, :lanes], slotkey
            )
            empty = unresolved & ~used_g
            ckey = jnp.where(empty, pos, s).astype(jnp.uint32)
            ckey_s, idx_s = jax.lax.sort((ckey, idx_arr), num_keys=2)
            first = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), ckey_s[1:] != ckey_s[:-1]]
            )
            win_s = first & (ckey_s < s)
            winner = jnp.zeros((width2,), jnp.bool_).at[idx_s].set(
                win_s, unique_indices=True
            )
            upd = match | winner
            row = jnp.concatenate([
                jnp.where(winner[:, None], slotkey, jnp.uint32(0)),
                add_u32,
                winner.astype(jnp.uint32)[:, None],
            ], axis=1)
            safe = jnp.where(upd, pos, s + idx_arr)
            slots = slots.at[
                (safe[:, None] * cols + ec[None, :]).reshape(-1)
            ].add(row.reshape(-1), mode="drop", unique_indices=True)
            n = n + jnp.sum(winner.astype(jnp.int32))
            hist = jax.lax.dynamic_update_index_in_dim(
                hist, hist[r] + jnp.sum(upd.astype(jnp.int32)), r, axis=0
            )
            return r + 1, unresolved & ~upd, slots, n, hist

        def cond(carry2):
            r, unresolved, *_ = carry2
            return (r < self.max_reprobes) & jnp.any(unresolved)

        r, unresolved, slots, n, hist = jax.lax.while_loop(
            cond, body,
            (jnp.int32(r_start), active_f[:width2], state.slots,
             state.n, state.probe_hist),
        )
        spilled = (
            state.spilled + lost + jnp.sum(unresolved.astype(jnp.int32))
        )
        return TableState(
            slots=self._renorm_flat(slots), n=n, spilled=spilled,
            probe_hist=hist,
        )

    def round0_args(self, ukeys, ucounts, uvalid):
        """(pos0, cleared, counts, active) for sorted_round r=0."""
        pos0, cleared = self._hash_parts(ukeys)
        return pos0, cleared, ucounts.astype(jnp.int32), uvalid

    def apply_mode_auto(self, width: int) -> str:
        """Sweep kernels when the round width justifies full-table
        passes (measured r5: a sweep is ~47 ms at l=26 k=14 while XLA
        element scatter costs ~80 ns/element), else flat element ops."""
        total = self.slots * self.slot_cols
        if (
            jax.default_backend() == "tpu"
            and self.sorted_rounds
            and total % 1024 == 0
            and width * self.slot_cols >= (1 << 19)
        ):
            return "kernel"
        return "element"

    def insert(self, state: TableState, ukeys: jax.Array, ucounts: jax.Array,
               uvalid: jax.Array) -> TableState:
        """Insert a deduplicated batch histogram (keys unique where
        uvalid) as ONE program of r4-style 2-D rounds — the sharded
        per-shard path and generic callers.  The single-chip counter uses
        the split sorted_round/apply_round/residue_phase flow instead
        (core/counter.py _table_step), whose round-0/1 slot updates run
        the Pallas sweep.  Each program sticks to ONE view of the slot
        array (2-D here) — see the sorted-apply section notes."""
        pos0, cleared = self._hash_parts(ukeys)
        add_digits = int32_to_digits(ucounts.astype(jnp.int32))
        body = self._round_body(pos0, cleared, add_digits)

        def cond(carry):
            r, unresolved, *_ = carry
            return (r < self.max_reprobes) & jnp.any(unresolved)

        slots2d = state.slots.reshape(self.slots, self.slot_cols)
        r, unresolved, slots2d, n, hist = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), uvalid, slots2d, state.n,
             state.probe_hist),
        )
        spilled = state.spilled + jnp.sum(unresolved.astype(jnp.int32))
        slots2d = self._renormed2d(slots2d)
        return TableState(
            slots=slots2d.reshape(-1), n=n, spilled=spilled,
            probe_hist=hist,
        )

    def insert_phase1(self, state: TableState, ukeys: jax.Array,
                      ucounts: jax.Array, uvalid: jax.Array,
                      residue_frac: int = 8):
        """Full-width reprobe rounds while the unresolved set exceeds the
        residue buffer (p // residue_frac) — typically one round: the
        non-colliding majority resolves immediately.

        Returns (state', r1, unresolved): digits NOT yet renormalized —
        insert_phase2 must ALWAYS follow (it finishes the rounds at
        residue width and renormalizes).  The two phases are separate
        jitted dispatches on purpose (see insert docstring: a fused
        program tiles the digit array pathologically).
        """
        p = ukeys.shape[0]
        p_small = min(p, max(256, p // residue_frac))
        pos0, cleared = self._hash_parts(ukeys)
        add_digits = int32_to_digits(ucounts.astype(jnp.int32))
        body = self._round_body(pos0, cleared, add_digits)
        max_r = self.max_reprobes

        def cond(carry):
            r, unresolved, *_ = carry
            return (r < max_r) & (
                jnp.sum(unresolved.astype(jnp.int32)) > p_small
            )

        slots2d = state.slots.reshape(self.slots, self.slot_cols)
        r1, unresolved, slots2d, n, hist = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32), uvalid, slots2d, state.n,
             state.probe_hist),
        )
        mid = TableState(
            slots=slots2d.reshape(-1), n=n, spilled=state.spilled,
            probe_hist=hist,
        )
        return mid, r1, unresolved

    def insert_phase2(self, state: TableState, ukeys: jax.Array,
                      ucounts: jax.Array, unresolved: jax.Array,
                      r1: jax.Array, residue_frac: int = 8) -> TableState:
        """Finish an insert: compact the unresolved residue (one
        payload-carrying sort), re-derive its probe state at 1/residue_frac
        width, and run the remaining rounds there — ~residue_frac x cheaper
        claim sorts/scatters per round than the r3 full-width loop.

        Exactness: the same rounds run in the same relative row order over
        the same rows (the compaction sort is stable on the original
        index), so claims resolve identically; rows that cannot fit the
        residue buffer once the reprobe budget is exhausted are counted
        spilled, as before.
        """
        p = ukeys.shape[0]
        p_small = min(p, max(256, p // residue_frac))
        max_r = self.max_reprobes
        arange = jnp.arange(p, dtype=jnp.int32)
        ckey = jnp.where(unresolved, arange, p)
        lanes = ukeys.shape[1]
        sorted_cols = jax.lax.sort(
            (ckey, ucounts.astype(jnp.int32))
            + tuple(ukeys[:, j] for j in range(lanes)),
            num_keys=1,
        )
        counts_s = sorted_cols[1][:p_small]
        ukeys_s = jnp.stack([c[:p_small] for c in sorted_cols[2:]], axis=1)
        n1 = jnp.sum(unresolved.astype(jnp.int32))
        carried = jnp.minimum(n1, p_small)
        lost = n1 - carried
        unres_s = jnp.arange(p_small, dtype=jnp.int32) < carried
        pos0_s, cleared_s = self._hash_parts(ukeys_s)
        add_digits_s = int32_to_digits(counts_s)
        body = self._round_body(pos0_s, cleared_s, add_digits_s)

        def cond(carry):
            r, unresolved, *_ = carry
            return (r < max_r) & jnp.any(unresolved)

        slots2d = state.slots.reshape(self.slots, self.slot_cols)
        _, unres_end, slots2d, n, hist = jax.lax.while_loop(
            cond, body,
            (r1, unres_s, slots2d, state.n, state.probe_hist),
        )
        spilled = state.spilled + lost + jnp.sum(
            unres_end.astype(jnp.int32)
        )
        slots2d = self._renormed2d(slots2d)
        return TableState(
            slots=slots2d.reshape(-1), n=n, spilled=spilled,
            probe_hist=hist,
        )

    def lookup(self, state: TableState, queries: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
        """Probe-walk lookup (reference getKmerCountDebug TSXHashMap.h:477-543).

        Probing stops at the first empty slot (slots are never freed, so an
        empty slot proves absence).  Returns (digits [N,3], found [N]).
        """
        n_q = queries.shape[0]
        lanes = self.spec.lanes
        pos0, cleared = self._hash_parts(queries)
        s = self.slots
        # derive loop carries from pos0 so they inherit its varying-manual
        # axes when called inside shard_map
        zero = pos0 * 0

        def cond(carry):
            r, active, *_ = carry
            return (r < self.max_reprobes) & jnp.any(active)

        def body(carry):
            r, active, out, found = carry
            pos = (pos0 + _triangular(r)) % s
            slotkey = cleared.at[:, 0].set(cleared[:, 0] | jnp.uint32(r))
            g = self._gather_rows(state.slots, pos)
            used_g = g[:, -1] != 0
            match = active & used_g & keys_equal(g[:, :lanes], slotkey)
            digits_g = _bitcast_i32(g[:, lanes : lanes + COUNT_DIGITS])
            out = jnp.where(match[:, None], digits_g, out)
            found = found | match
            active = active & used_g & ~match
            return r + 1, active, out, found

        _, _, out, found = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32),
             zero == 0,
             jnp.zeros((n_q, COUNT_DIGITS), jnp.int32) + zero[:, None],
             zero != 0),
        )
        return out, found

    def get_positions(self, state: TableState, queries: jax.Array
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Debug API: the slot index and reprobe count where each query key
        resides (reference getPosition TSXHashMap.h:759-778 and
        getKmerPositions).  Returns (pos int32 [N], reprobe int32 [N],
        found bool [N]); pos/reprobe are -1 when absent."""
        n_q = queries.shape[0]
        pos0, cleared = self._hash_parts(queries)
        s = self.slots
        zero = pos0 * 0

        def cond(carry):
            r, active, *_ = carry
            return (r < self.max_reprobes) & jnp.any(active)

        def body(carry):
            r, active, out_pos, out_r, found = carry
            pos = (pos0 + _triangular(r)) % s
            slotkey = cleared.at[:, 0].set(cleared[:, 0] | jnp.uint32(r))
            g = self._gather_rows(state.slots, pos)
            used_g = g[:, -1] != 0
            match = active & used_g & keys_equal(
                g[:, : self.spec.lanes], slotkey
            )
            out_pos = jnp.where(match, pos, out_pos)
            out_r = jnp.where(match, r, out_r)
            found = found | match
            active = active & used_g & ~match
            return r + 1, active, out_pos, out_r, found

        _, _, out_pos, out_r, found = jax.lax.while_loop(
            cond, body,
            (jnp.zeros((), jnp.int32),
             zero == 0,
             zero - 1,
             zero - 1,
             zero != 0),
        )
        return out_pos, out_r, found

    def reconstruct_all(self, state: TableState
                        ) -> tuple[jax.Array, jax.Array]:
        """Rebuild every stored k-mer from its slot — getAllKmers analog.

        For slot i holding key = (func << L) | r: the missing low L hash bits
        are (i - r(r+1)/2) mod 2^L, so hash = (key & ~lowmask) | missing and
        kmer = inv_apply(hash) (reference TSXHashMap.h:660-722, §3.4).
        Returns (kmers uint32 [slots, lanes], used bool [slots]).
        """
        i = jnp.arange(self.slots, dtype=jnp.int32)
        keys = self.state_keys(state)
        key0 = keys[:, 0]
        r = (key0 & self._low_mask).astype(jnp.int32)
        missing = (i - _triangular(r)) % self.slots
        hashed = keys.at[:, 0].set(
            (key0 & ~self._low_mask) | missing.astype(jnp.uint32)
        )
        kmers = self.hash_fn.inv_apply(hashed)
        return kmers, self.state_used(state)

    # --- host export ---

    _EXPORT_CHUNK = 1 << 20  # slots per export program invocation

    def _export_program(self, chunk: int):
        """Cached jitted chunk exporter: reconstruct + compact `chunk`
        slots starting at a dynamic offset.

        One program per table, reused for every chunk and every call —
        never a fresh per-call jax.jit (VERDICT r4 #3: a standalone small
        jit over the [2^l, few] slot array is one layout decision away
        from (8,128) tiling = 25x HBM, and each per-call jit paid a
        ~1.6 s remote recompile).  Compaction keeps host traffic O(used),
        not O(2^l): used rows sort to the front, the caller fetches only
        the used prefix."""
        jit = getattr(self, "_export_jit", None)
        if jit is not None and self._export_jit_chunk == chunk:
            return jit
        lanes = self.spec.lanes

        def export_chunk(state: TableState, start):
            rows = jax.lax.dynamic_slice(
                state.slots, (start * self.slot_cols,),
                (chunk * self.slot_cols,),
            ).reshape(chunk, self.slot_cols)
            keys = rows[:, :lanes]
            key0 = keys[:, 0]
            r = (key0 & self._low_mask).astype(jnp.int32)
            i = start + jnp.arange(chunk, dtype=jnp.int32)
            missing = (i - _triangular(r)) % self.slots
            hashed = keys.at[:, 0].set(
                (key0 & ~self._low_mask) | missing.astype(jnp.uint32)
            )
            kmers = self.hash_fn.inv_apply(hashed)
            used = rows[:, -1] != 0
            digits = rows[:, lanes : lanes + COUNT_DIGITS]
            ckey = jnp.where(
                used, jnp.arange(chunk, dtype=jnp.int32), chunk
            )
            out = jax.lax.sort(
                (ckey,)
                + tuple(kmers[:, j] for j in range(lanes))
                + tuple(digits[:, j] for j in range(COUNT_DIGITS)),
                num_keys=1,
            )
            n_used = jnp.sum(used.astype(jnp.int32))
            return out[1:], n_used

        jit = jax.jit(export_chunk)
        self._export_jit = jit
        self._export_jit_chunk = chunk
        return jit

    def to_host(self, state: TableState) -> tuple[np.ndarray, np.ndarray, int]:
        """Fetch (kmer keys [n, lanes], counts [n] python ints, n).

        Chunked + compacted: device work and host traffic are O(used
        prefix per chunk), with one scalar round trip per wave of chunks
        (the tunnel charges ~35 ms per device_get)."""
        lanes = self.spec.lanes
        chunk = min(self.slots, self._EXPORT_CHUNK)
        program = self._export_program(chunk)
        n_chunks = -(-self.slots // chunk)
        kmer_parts: list[np.ndarray] = []
        digit_parts: list[np.ndarray] = []
        wave = 16
        for w0 in range(0, n_chunks, wave):
            outs = [
                program(state, jnp.int32(ci * chunk))
                for ci in range(w0, min(w0 + wave, n_chunks))
            ]
            ns = np.asarray(jax.device_get(
                jnp.stack([o[1] for o in outs])
            ))
            for (cols, _), n in zip(outs, ns):
                n = int(n)
                if not n:
                    continue
                # pow2 width buckets keep the eager-slice program count
                # bounded (each distinct slice shape compiles once)
                width = 1 << max(8, n - 1).bit_length()
                width = min(width, chunk)
                got = jax.device_get([c[:width] for c in cols])
                kmer_parts.append(
                    np.stack([np.asarray(c[:n]) for c in got[:lanes]],
                             axis=1)
                )
                digit_parts.append(
                    np.stack([np.asarray(c[:n]) for c in got[lanes:]],
                             axis=1).astype(np.int64)
                )
        if not kmer_parts:
            return (np.zeros((0, lanes), np.uint32),
                    np.zeros((0,), dtype=object), 0)
        kmers = np.concatenate(kmer_parts, axis=0)
        digits = np.concatenate(digit_parts, axis=0)
        counts = np.array(
            [counts_to_int(*d) for d in digits], dtype=object
        )
        return kmers, counts, len(kmers)

    def fill_factor(self, state: TableState) -> float:
        """Occupancy ratio — the print_stats analog (TSXHashMap.h:390-395)."""
        return float(jax.device_get(state.n)) / self.slots
