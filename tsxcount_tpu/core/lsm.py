"""Log-structured (LSM) multi-level count store for very long streams.

The flat CountStore pays an O(capacity) sorted-merge every `merge_every`
batches; once the distinct-key table is much larger than a batch, that
re-sort of mostly-idle rows dominates.  The LSM layout keeps a geometric
cascade of stores L0..Lm (|L_{i+1}| = growth * |L_i|): batch histograms
fold into L0, and every `growth`-th flush of level i absorbs it into
level i+1 (CountStore.absorb sums digit triples exactly).  Amortized
device work per batch drops from O(capacity / merge_every) to
O(P * levels) — the standard LSM write-amplification trade, with exact
counts preserved because absorption is an exact sorted-merge, not a
compaction that drops entries.

The reference has no analog (its table is a single fixed array,
reference src/tsxcount/TSXHashMap.h:98-103); this is a beyond-reference
capability for streaming datasets whose distinct count exceeds device
batch sizes by orders of magnitude.

Cascade schedule is deterministic host-side integer math (no device
readbacks on the hot path).  Queries and exports first `collapse()` all
levels into the top level so the usual CountStore read side applies.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tsxcount_tpu.config import KmerSpec
from tsxcount_tpu.core.store import CountStore, StoreState


class LSMStore:
    """Geometric cascade of CountStores with exact cross-level merging.

    capacity: total distinct-key capacity (the top level's size).
    base_capacity: L0 size — must hold `merge_every` batch histograms'
    worth of distinct keys (callers size it as merge_every * positions,
    padded to the Pallas tile).
    """

    def __init__(self, spec: KmerSpec, capacity: int, base_capacity: int,
                 growth: int = 8):
        if growth < 2:
            raise ValueError("growth must be >= 2")
        self.spec = spec
        self.growth = int(growth)
        caps = [int(base_capacity)]
        while caps[-1] * growth < capacity:
            caps.append(caps[-1] * growth)
        caps.append(int(capacity))
        self.levels = [CountStore(spec, c) for c in caps]
        self._absorbs = [
            jax.jit(self.levels[i + 1].absorb, donate_argnums=(0,))
            for i in range(len(caps) - 1)
        ]
        self._merge0 = jax.jit(
            self.levels[0].merge_stacked, donate_argnums=(0,)
        )
        self._flushes = 0   # L0 merge counter driving the cascade
        self._l0_fill = None  # merges L0 holds before cascading (set on 1st)

    def init_state(self) -> list[StoreState]:
        return [lvl.init_state() for lvl in self.levels]

    def reset_schedule(self) -> None:
        """Restart the host-side cascade counter (fresh-state reuse)."""
        self._flushes = 0

    @property
    def capacity(self) -> int:
        return self.levels[-1].capacity

    def merge_stacked(self, states: list[StoreState], ukeys, ucounts,
                      uvalid) -> list[StoreState]:
        """Fold R batch histograms into L0, cascading full levels upward.

        With F = how many R-batch merges fit in L0, level i absorbs into
        level i+1 every F * growth^i merges (checked bottom-up in the same
        call, carry-style), so level i+1 transiently holds at most `growth`
        absorbed L_i images — within its capacity by construction.
        """
        states = list(states)
        if self._l0_fill is None:
            r, p, _ = ukeys.shape
            self._l0_fill = max(1, self.levels[0].capacity // (r * p))
        states[0] = self._merge0(states[0], ukeys, ucounts, uvalid)
        self._flushes += 1
        period = self._l0_fill
        for i in range(len(self.levels) - 1):
            if self._flushes % period == 0:
                states[i + 1] = self._absorbs[i](states[i + 1], states[i])
                states[i] = self.levels[i].init_state()
            else:
                break  # higher levels only cascade when lower ones did
            period *= self.growth
        return states

    def collapse(self, states: list[StoreState]) -> list[StoreState]:
        """Absorb every level into the top level (for reads/exports)."""
        states = list(states)
        for i in range(len(self.levels) - 1):
            states[i + 1] = self._absorbs[i](states[i + 1], states[i])
            states[i] = self.levels[i].init_state()
        return states

    # --- read side (post-collapse, the top level is authoritative) ---

    def lookup(self, states: list[StoreState], queries: jax.Array):
        """Sum counts across levels (works without a prior collapse)."""
        digits = None
        found = None
        for lvl, st in zip(self.levels, states):
            d, f = lvl.lookup(st, queries)
            digits = d if digits is None else digits + d
            found = f if found is None else (found | f)
        from tsxcount_tpu.ops.count import renorm_digits

        return renorm_digits(digits), found

    def to_host(self, states: list[StoreState]):
        for st in states[:-1]:
            if int(jax.device_get(st.n)) != 0:
                raise RuntimeError("call collapse() before to_host()")
        return self.levels[-1].to_host(states[-1])
