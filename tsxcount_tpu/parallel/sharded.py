"""Multi-chip sharded counting: hash-prefix routing + per-shard stores.

This module replaces the reference's entire shared-state concurrency model.
Where tsxCount lets every thread hammer one shared table and serializes with
TSX/CAS/locks (SURVEY.md §2.3), here:

  * read batches stream data-parallel: each device packs/extracts its own
    slice (the omp-task analog, reference src/mains/main.cpp:132-218);
  * each device dedupes its local k-mers (sort + segmented sum), then routes
    (key, count) pairs to the *owner* shard of the key's hash prefix with one
    `jax.lax.all_to_all` over the mesh — ICI traffic instead of cache-line
    contention;
  * the owner merges into its private store shard: conflict-free by
    construction, no serialization primitive anywhere;
  * routing-capacity spill is counted (the analog of the reference's abort
    statistics, TSXHashMapTSXPerf.h:195-239) and surfaced as an error —
    exactness is never silently lost.

Works identically on a real multi-chip slice and on the CPU-simulated mesh
(`--xla_force_host_platform_device_count`), and across hosts once
`jax.distributed.initialize` has run (same SPMD program over DCN).
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tsxcount_tpu.config import BatchSpec, KmerSpec, counts_to_int
from tsxcount_tpu.core.counter import _QUERY_BATCH, TableFull
from tsxcount_tpu.core.store import CountStore, StoreState
from tsxcount_tpu.io.fastx import read_fastx
from tsxcount_tpu.io.packer import ReadPacker
from tsxcount_tpu.ops.canonical import canonicalize
from tsxcount_tpu.ops.count import count_unique
from tsxcount_tpu.ops.gf2 import DEFAULT_SEED, GF2Hash
from tsxcount_tpu.ops.window import extract_kmers, intervals_to_valid
from tsxcount_tpu.parallel.mesh import SHARD_AXIS, make_shard_mesh
from tsxcount_tpu.utils.goldenfile import read_golden
from tsxcount_tpu.utils.sequence import kmers_to_strings, strings_to_kmers

shard_map = jax.shard_map


_SCALAR_FIELDS = ("n", "overflowed", "spilled")


def _wrap_scalars(state):
    """Give scalar state fields a singleton axis so shard_map can stack
    them into per-shard vectors (P('shard') out_specs need rank >= 1).
    Works for both StoreState and TableState."""
    return state._replace(**{
        f: getattr(state, f)[None]
        for f in _SCALAR_FIELDS if f in state._fields
    })


def _unwrap_scalars(state):
    return state._replace(**{
        f: getattr(state, f)[0]
        for f in _SCALAR_FIELDS if f in state._fields
    })


def _state_specs(state_cls):
    """Pytree of P('shard') specs matching a state NamedTuple class."""
    return state_cls(*([P(SHARD_AXIS)] * len(state_cls._fields)))


def hash_owner(hashes: jax.Array, spec: KmerSpec, n_shards: int) -> jax.Array:
    """Owner shard of each hashed key: top hash bits mod n_shards.

    Uses the *top* of the bijective hash so it is independent of the low
    L bits used for intra-shard table addressing.
    """
    top = hashes[:, -1]
    shift = max(0, spec.top_lane_bits - 16)
    return ((top >> jnp.uint32(shift)).astype(jnp.int32)) % n_shards


class ShardedKmerCounter:
    """KmerCounter-compatible API over an N-device shard mesh."""

    def __init__(
        self,
        k: int,
        n_shards: int,
        l: int = 26,
        s: int = 4,
        backend: str = "sort",
        batch_words: int = 1 << 16,
        n_policy: str = "drop",
        hash_seed: int = DEFAULT_SEED,
        identity_hash: bool = False,
        capacity_factor: float = 2.0,
        seed: int = 0,
        devices=None,
        max_reprobes: int = 64,
        canonical: bool = False,
        merge_every: int = 1,  # accepted for API parity (per-batch merge)
        lsm: bool = False,    # accepted for API parity (per-shard stores
        lsm_growth: int = 8,  # are batch-sized; levels add nothing there)
        threads: int = 0,
        prefetch_depth: int = 3,
    ):
        del merge_every, lsm, lsm_growth
        self.threads = threads if threads > 0 else 1
        self.prefetch_depth = max(1, prefetch_depth)
        from tsxcount_tpu.core.counter import MODE_TO_BACKEND

        self.spec = KmerSpec(k)
        self.batch = BatchSpec(self.spec, batch_words)
        self.l = l
        self.s = s
        self.backend = MODE_TO_BACKEND.get(backend, backend)
        if self.backend not in ("sort", "table"):
            raise ValueError(f"unknown backend {backend}")
        self.n_shards = n_shards
        self.n_policy = n_policy
        self.seed = seed
        self.canonical = canonical
        self.mesh = make_shard_mesh(n_shards, devices=devices)
        self.hash_fn = GF2Hash(self.spec, seed=hash_seed, identity=identity_hash)
        # per-shard capacity: the global 2^l table split across shards
        l_local = max(1, l - max(0, n_shards.bit_length() - 1))
        if self.backend == "table":
            from tsxcount_tpu.core.table import QuotientTable

            self.table = QuotientTable(
                self.spec, l_local, self.hash_fn, max_reprobes=max_reprobes
            )
            self._backend_obj = self.table
        else:
            cap_per_shard = max(1, (1 << l) // n_shards)
            self.store = CountStore(self.spec, capacity=cap_per_shard)
            self._backend_obj = self.store
        # routing capacity per (src, dst) pair
        self.route_cap = int(
            capacity_factor * self.batch.positions / n_shards
        )
        self.route_cap = max(16, self.route_cap)

        self._step = jax.jit(self._make_step(), donate_argnums=(0,))
        self._lookup = jax.jit(self._make_lookup())
        self.state = self._init_state()
        self.packer = ReadPacker(self.batch, n_policy=n_policy, seed=seed)
        self._pending: list = []
        self.batches_processed = 0
        self.elapsed = 0.0

    # --- sharded state ---

    @property
    def _state_cls(self):
        from tsxcount_tpu.core.table import TableState

        return TableState if self.backend == "table" else StoreState

    def _init_state(self):
        init = shard_map(
            lambda: _wrap_scalars(self._backend_obj.init_state()),
            mesh=self.mesh,
            in_specs=(),
            out_specs=_state_specs(self._state_cls),
        )
        # scalars become per-shard vectors of length n_shards
        return jax.jit(init)()

    def _make_step(self):
        batch = self.batch
        spec = self.spec
        n_shards = self.n_shards
        cap = self.route_cap
        backend_obj = self._backend_obj
        accumulate = (
            backend_obj.insert if self.backend == "table" else backend_obj.merge
        )
        hash_fn = self.hash_fn
        canonical = self.canonical
        lanes = spec.lanes

        def local_step(state: StoreState, buf):
            # local slices keep a singleton leading shard axis; drop it.
            # buf = [words | validity intervals] (one H2D buffer per shard)
            buf = buf[0]
            words = buf[: batch.total_words]
            kmers = extract_kmers(words, batch)
            if canonical:
                kmers = canonicalize(kmers, spec)
            valid = intervals_to_valid(buf[batch.total_words :], batch)
            uc = count_unique(kmers, valid, spec=spec)
            p = uc.keys.shape[0]

            # owner of each unique key
            hashes = hash_fn.apply(uc.keys)
            owner = jnp.where(
                uc.valid, hash_owner(hashes, spec, n_shards), n_shards
            )
            # group rows by destination: one sort keyed on owner with the
            # key lanes + counts as payload (gather-free)
            sorted_all = jax.lax.sort(
                (owner,)
                + tuple(uc.keys[:, j] for j in range(lanes))
                + (uc.counts,),
                num_keys=1,
            )
            owner_s = sorted_all[0]
            keys_s = jnp.stack(sorted_all[1 : 1 + lanes], axis=1)
            counts_s = sorted_all[1 + lanes]
            arange = jnp.arange(p, dtype=jnp.int32)
            is_start = jnp.concatenate(
                [jnp.ones((1,), jnp.bool_), owner_s[1:] != owner_s[:-1]]
            )
            starts = jax.lax.cummax(jnp.where(is_start, arange, 0))
            rank = arange - starts
            sendable = (owner_s < n_shards) & (rank < cap)
            spill = jnp.sum(
                ((owner_s < n_shards) & (rank >= cap)).astype(jnp.int32)
            )
            dst = jnp.where(sendable, owner_s * cap + rank, n_shards * cap)

            send_keys = jnp.zeros((n_shards * cap, lanes), jnp.uint32).at[
                dst
            ].set(keys_s, mode="drop")
            send_counts = jnp.zeros((n_shards * cap,), jnp.int32).at[dst].set(
                counts_s, mode="drop"
            )
            send_n = jnp.zeros((n_shards,), jnp.int32).at[
                jnp.where(owner_s < n_shards, owner_s, n_shards)
            ].add(sendable.astype(jnp.int32), mode="drop")

            # exchange: slice j of the result = what shard j sent to me
            recv_keys = jax.lax.all_to_all(
                send_keys.reshape(n_shards, cap, lanes), SHARD_AXIS, 0, 0,
                tiled=False,
            ).reshape(n_shards * cap, lanes)
            recv_counts = jax.lax.all_to_all(
                send_counts.reshape(n_shards, cap), SHARD_AXIS, 0, 0,
                tiled=False,
            ).reshape(n_shards * cap)
            recv_n = jax.lax.all_to_all(
                send_n.reshape(n_shards, 1), SHARD_AXIS, 0, 0, tiled=False
            ).reshape(n_shards)

            slot_rank = jnp.tile(jnp.arange(cap, dtype=jnp.int32), n_shards)
            src_of_slot = jnp.repeat(
                jnp.arange(n_shards, dtype=jnp.int32), cap
            )
            recv_valid = slot_rank < recv_n[src_of_slot]

            # owner-side exact accumulation (weights = pre-deduped counts)
            uc2 = count_unique(recv_keys, recv_valid, weights=recv_counts,
                               spec=spec, max_multiplicity=n_shards)
            new_state = accumulate(
                _unwrap_scalars(state), uc2.keys, uc2.counts, uc2.valid
            )
            total_spill = jax.lax.psum(spill[None], SHARD_AXIS)
            return _wrap_scalars(new_state), total_spill

        def step(state, buf_stacked):
            return shard_map(
                local_step,
                mesh=self.mesh,
                in_specs=(
                    _state_specs(self._state_cls),
                    P(SHARD_AXIS),
                ),
                out_specs=(_state_specs(self._state_cls), P()),
            )(state, buf_stacked)

        return step

    def _make_lookup(self):
        backend_obj = self._backend_obj

        def local_lookup(state, queries):
            # queries are replicated; mark them shard-varying so the search
            # carries have consistent varying-manual-axes with the
            # shard-local table state
            queries = jax.lax.pcast(queries, (SHARD_AXIS,), to="varying")
            digits, found = backend_obj.lookup(
                _unwrap_scalars(state), queries
            )
            digits = jnp.where(found[:, None], digits, 0)
            # each key lives in exactly one shard -> psum combines results
            return (
                jax.lax.psum(digits, SHARD_AXIS),
                jax.lax.psum(found.astype(jnp.int32), SHARD_AXIS) > 0,
            )

        def lookup(state, queries):
            return shard_map(
                local_lookup,
                mesh=self.mesh,
                in_specs=(_state_specs(self._state_cls), P()),
                out_specs=(P(), P()),
            )(state, queries)

        return lookup

    # --- ingestion (KmerCounter-compatible surface) ---

    @property
    def _local_shards(self) -> int:
        """Shards fed by this process (== n_shards in single-controller)."""
        return max(
            1, self.n_shards // max(1, jax.process_count())
        ) if jax.process_count() > 1 else self.n_shards

    def _to_global(self, stacked: np.ndarray):
        """Host-local (local_shards, ...) batch -> global sharded array.

        Multi-host: every process contributes its slice (SPMD, one global
        array over DCN); single-host: plain device put.
        """
        if jax.process_count() == 1:
            return jnp.asarray(stacked)
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as PS

        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, PS(SHARD_AXIS)), stacked
        )

    def _dispatch_pending(self, force: bool = False) -> None:
        if not self._pending:
            return
        n_local = self._local_shards
        if len(self._pending) < n_local and not force:
            return
        t0 = time.perf_counter()
        while self._pending:
            group = self._pending[:n_local]
            self._pending = self._pending[n_local:]
            if len(group) < n_local and not force:
                self._pending = group
                break
            while len(group) < n_local:
                from tsxcount_tpu.io.packer import PackedBatch

                group.append(PackedBatch.empty(group[0].batch))
            buf = self._to_global(np.stack([g.buf for g in group]))
            self.state, spill = self._step(self.state, buf)
            self.batches_processed += self.n_shards
            spill = int(np.asarray(jax.device_get(spill)).sum())
            if spill:
                raise TableFull(
                    f"{spill} routed kmers exceeded per-destination capacity "
                    f"{self.route_cap}; increase capacity_factor"
                )
        self.elapsed += time.perf_counter() - t0

    def add_reads(self, reads: Iterable[str | bytes]) -> None:
        for seq in reads:
            for pb in self.packer.feed(seq):
                self._pending.append(pb)
                self._dispatch_pending()

    def flush(self) -> None:
        """Drain all pending host batches into device state (used before
        checkpointing; finish() adds the capacity checks on top)."""
        self._pending.extend(self.packer.finish())
        self._dispatch_pending(force=True)

    def finish(self) -> None:
        self.flush()
        jax.block_until_ready(self.state)
        if self.backend == "table":
            spilled = int(np.sum(self._gather(self.state.spilled)))
            if spilled:
                raise TableFull(
                    f"{spilled} kmers unresolved after "
                    f"{self.table.max_reprobes} reprobes in a table shard; "
                    f"increase --l"
                )
        elif bool(np.any(self._gather(self.state.overflowed))):
            raise TableFull(
                f"a table shard exceeded capacity 2^{self.l}/{self.n_shards}; "
                f"rerun with larger --l"
            )

    def count_file(self, path: str | Path) -> None:
        self.add_reads(rec.seq for rec in read_fastx(path))
        self.finish()

    # --- queries / export ---

    def _gather(self, arr) -> np.ndarray:
        """Fetch a shard-partitioned state array on every process.

        Single-process: plain device_get.  Multi-process: concatenate the
        addressable shards and allgather across processes (shard order is
        process-major, matching make_shard_mesh's jax.devices() order).
        """
        if jax.process_count() == 1:
            return np.asarray(jax.device_get(arr))
        from jax.experimental import multihost_utils

        local = np.concatenate(
            [np.asarray(sh.data) for sh in arr.addressable_shards], axis=0
        )
        gathered = np.asarray(multihost_utils.process_allgather(local))
        return gathered.reshape(arr.shape)

    @property
    def distinct(self) -> int:
        return int(np.sum(self._gather(self.state.n)))

    @property
    def total_kmers(self) -> int:
        return self.packer.stats.windows

    def get_counts(self, kmers: list[str]) -> list[int]:
        if not kmers:
            return []
        keys = strings_to_kmers(kmers, self.spec)
        if self.canonical:
            keys = np.asarray(
                jax.jit(lambda x: canonicalize(x, self.spec))(jnp.asarray(keys))
            )
        out: list[int] = []
        n = len(kmers)
        for off in range(0, n, _QUERY_BATCH):
            chunk = keys[off : off + _QUERY_BATCH]
            pad = _QUERY_BATCH - len(chunk)
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)], axis=0
                )
            digits, found = self._lookup(self.state, jnp.asarray(chunk))
            digits = np.asarray(jax.device_get(digits))
            found = np.asarray(jax.device_get(found))
            m = min(_QUERY_BATCH, n - off)
            for i in range(m):
                out.append(counts_to_int(*digits[i]) if found[i] else 0)
        return out

    def items(self):
        if self.backend == "table":
            yield from self._items_table()
            return
        cap = self.store.capacity
        keys = self._gather(self.state.keys).reshape(
            self.n_shards, cap, self.spec.lanes
        )
        digits = self._gather(self.state.digits).reshape(
            self.n_shards, cap, -1
        )
        ns = self._gather(self.state.n)
        for shard in range(self.n_shards):
            n = int(ns[shard])
            if n == 0:
                continue
            strings = kmers_to_strings(keys[shard, :n], self.spec)
            for i, kmer_str in enumerate(strings):
                yield kmer_str, counts_to_int(*digits[shard, i])

    def _items_table(self):
        """Per-shard inverse-hash reconstruction (getAllKmers analog)."""
        from tsxcount_tpu.core.table import TableState

        slots = self.table.slots
        host = {
            name: self._gather(val)
            for name, val in self.state._asdict().items()
        }
        for shard in range(self.n_shards):
            shard_state = TableState(
                keys=jnp.asarray(
                    host["keys"].reshape(self.n_shards, slots, -1)[shard]
                ),
                digits=jnp.asarray(
                    host["digits"].reshape(self.n_shards, slots, -1)[shard]
                ),
                used=jnp.asarray(
                    host["used"].reshape(self.n_shards, slots)[shard]
                ),
                n=jnp.asarray(host["n"][shard]),
                spilled=jnp.asarray(host["spilled"][shard]),
                probe_hist=jnp.asarray(
                    host["probe_hist"].reshape(self.n_shards, -1)[shard]
                ),
            )
            keys, counts, n = self.table.to_host(shard_state)
            strings = kmers_to_strings(keys, self.spec)
            for kmer_str, cnt in zip(strings, counts):
                yield kmer_str, int(cnt)

    def to_dict(self) -> dict[str, int]:
        return dict(self.items())

    def check(self, golden_path: str | Path, abort: bool = False,
              max_report: int = 20):
        from tsxcount_tpu.core.counter import CheckAbort, CheckResult

        golden = read_golden(golden_path)
        res = CheckResult()
        kmers = list(golden.keys())
        counts = self.get_counts(kmers)
        for kmer_str, got in zip(kmers, counts):
            want = golden[kmer_str]
            res.n_checked += 1
            if got == want:
                res.n_matched += 1
            else:
                entry = (kmer_str, want, got)
                target = res.missing if got == 0 else res.mismatches
                if len(target) < max_report:
                    target.append(entry)
                if abort:
                    raise CheckAbort(
                        f"count mismatch for {kmer_str}: expected {want}, "
                        f"got {got}"
                    )
        res.extra_distinct = max(0, self.distinct - len(golden))
        return res

    def stats(self) -> dict:
        st = dataclasses.asdict(self.packer.stats)
        ns = self._gather(self.state.n)
        st.update(
            backend=self.backend,
            k=self.spec.k,
            l=self.l,
            lanes=self.spec.lanes,
            n_shards=self.n_shards,
            distinct_kmers=self.distinct,
            total_kmers=self.total_kmers,
            batches=self.batches_processed,
            device_seconds=round(self.elapsed, 4),
            shard_distinct=[int(x) for x in ns],
            shard_imbalance=(
                round(float(ns.max()) / max(1.0, float(ns.mean())), 4)
                if ns.size else 1.0
            ),
        )
        return st

    def print_stats(self) -> None:
        for key, val in self.stats().items():
            print(f"{key}: {val}")
