"""Count-state checkpointing (save / resume).

The reference has NO persistence: counts live only in process memory and are
consumed by --check (SURVEY.md §5 — `getAllKmers` is the only export).  Here
the full counter state (store/table arrays + hash matrix + config + ingest
stats) round-trips through one .npz file, so long counting jobs can stop and
resume, and count tables can be shipped between machines.

Both counter classes round-trip: `KmerCounter` (single chip, either backend,
flat or LSM store) and `ShardedKmerCounter` (the per-shard states are saved
as the stacked global arrays and re-sharded over the mesh on load).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

FORMAT_VERSION = 3  # v3: sharded state keys are the bijective-hash image
                    # (routing rides the dedupe sort order); v1/v2 load for
                    # unsharded counters, sharded v2 files are refused


def _is_sharded(counter) -> bool:
    return hasattr(counter, "n_shards")


def save_counter(counter, path: str | Path) -> None:
    """Serialize a KmerCounter or ShardedKmerCounter to an .npz file."""
    meta = {
        "format": FORMAT_VERSION,
        "k": counter.spec.k,
        "l": counter.l,
        "s": counter.s,
        "backend": counter.backend,
        "n_policy": counter.n_policy,
        "identity_hash": counter.hash_fn.identity,
        "canonical": counter.canonical,
        "collapse_hp": getattr(counter, "collapse_hp", True),
        "hash_first": getattr(counter, "hash_first", False),
        "mix_prefix": getattr(counter, "mix_prefix", False),
        "stats": dataclasses.asdict(counter.packer.stats),
        "batches_processed": counter.batches_processed,
        "lsm": getattr(counter, "lsm", False),
        "lsm_growth": getattr(counter, "lsm_growth", 8),
        "merge_every": getattr(counter, "merge_every", 1),
        "n_shards": getattr(counter, "n_shards", 0),  # 0 = unsharded
        # sharded stores hold the routing bijection's image; r4 default is
        # the ARX lane mix, pre-r4 files were GF(2)
        "routing_hash": getattr(counter, "routing_hash", "gf2"),
        "max_reprobes": (
            counter.table.max_reprobes
            if counter.backend == "table" else 0
        ),
    }
    if _is_sharded(counter):
        counter.flush()  # drain pending batches so state is authoritative
        counter._collapse_lsm()  # LSM: everything lands in the top level
        state = counter._read_state
        arrays = {
            f"state_{name}": counter._gather(val)
            for name, val in state._asdict().items()
        }
    else:
        counter._flush_pending()
        counter._collapse_if_lsm()  # LSM: everything lands in the top level
        state = counter.state[-1] if meta["lsm"] else counter.state
        arrays = {
            f"state_{name}": np.asarray(jax.device_get(val))
            for name, val in state._asdict().items()
        }
    arrays["hash_matrix"] = counter.hash_fn.matrix
    arrays["hash_inverse"] = counter.hash_fn.inverse
    np.savez_compressed(path, meta=json.dumps(meta), **arrays)


def _state_array(name: str, data) -> np.ndarray:
    """Fetch one state field, migrating pre-r4 table layouts: old files
    stored keys/digits/used as three arrays; the r4 TableState packs them
    into one combined `slots` row array (core/table.py)."""
    key = f"state_{name}"
    if key in data:
        arr = data[key]
        if name == "slots" and arr.ndim == 2:
            # r4 checkpoints stored the combined rows as [slots, C];
            # r5 state is flat column-major (core/table.py TableState)
            arr = np.ascontiguousarray(arr.T).reshape(-1)
        return arr
    if name == "slots" and "state_keys" in data:
        keys = np.asarray(data["state_keys"])
        digits = np.asarray(data["state_digits"]).view(np.uint32)
        used = np.asarray(data["state_used"]).astype(np.uint32)[:, None]
        return np.ascontiguousarray(
            np.concatenate([keys, digits, used], axis=1).T
        ).reshape(-1)
    raise KeyError(f"checkpoint missing state field {name}")


def _restore_hash(counter, data) -> None:
    """Restore the exact hash matrix (layout-defining for table backend)."""
    import jax.numpy as jnp

    counter.hash_fn.matrix = data["hash_matrix"]
    counter.hash_fn.inverse = data["hash_inverse"]
    counter.hash_fn._mat_t = jnp.asarray(counter.hash_fn.matrix.T,
                                         dtype=jnp.int8)
    counter.hash_fn._inv_t = jnp.asarray(counter.hash_fn.inverse.T,
                                         dtype=jnp.int8)


def load_counter(path: str | Path, batch_words: int = 1 << 16,
                 devices=None):
    """Rebuild a (Sharded)KmerCounter from an .npz checkpoint and resume.

    The checkpoint's own shape (shards, backend, k, l, ...) wins; only the
    ingest batch size is caller-tunable (it is not part of the state).
    """
    from tsxcount_tpu.io.packer import PackStats

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["meta"]))
        if meta["format"] > FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint format {meta['format']}")
        if meta.get("n_shards", 0):
            counter = _load_sharded(meta, data, batch_words, devices)
        else:
            counter = _load_single(meta, data, batch_words)
        counter.packer.stats = PackStats(**meta["stats"])
        counter.batches_processed = meta["batches_processed"]
    return counter


def _load_single(meta, data, batch_words):
    from tsxcount_tpu.core.counter import KmerCounter

    import jax.numpy as jnp

    counter = KmerCounter(
        k=meta["k"], l=meta["l"], s=meta["s"], backend=meta["backend"],
        batch_words=batch_words, n_policy=meta["n_policy"],
        identity_hash=meta["identity_hash"],
        canonical=meta.get("canonical", False),
        collapse_homopolymers=meta.get("collapse_hp", True),
        # pre-r4 checkpoints wrote hash_first=True meaning the GF(2)
        # image (True now aliases the r4 "mix" bijection — map it back so
        # old state arrays keep decoding)
        hash_first=(
            "gf2" if meta.get("hash_first", False) is True
            else meta.get("hash_first", False)
        ),
        # old checkpoints (pre-r4) hold plain raw-key stores: mix off
        mix_prefix=meta.get("mix_prefix", False),
        lsm=meta.get("lsm", False),
        lsm_growth=meta.get("lsm_growth", 8),
        merge_every=meta.get("merge_every", 4),
    )
    _restore_hash(counter, data)
    ref_state = counter.state[-1] if counter.lsm else counter.state
    state_cls = type(ref_state)
    loaded = state_cls(
        **{
            name: jnp.asarray(_state_array(name, data))
            for name in ref_state._fields
        }
    )
    if counter.lsm:
        counter.state = counter.state[:-1] + [loaded]
    else:
        counter.state = loaded
    return counter


def _load_sharded(meta, data, batch_words, devices):
    """Rebuild a ShardedKmerCounter; state arrays re-shard over the mesh.

    Single-controller restore: every process must see the full checkpoint
    file (multi-host jobs resume by loading the same file on each host).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from tsxcount_tpu.parallel.mesh import SHARD_AXIS
    from tsxcount_tpu.parallel.sharded import ShardedKmerCounter

    if meta["format"] < 3:
        raise ValueError(
            "sharded checkpoints written before format 3 store raw keys; "
            "this version shards by hashed key — re-count to regenerate"
        )
    counter = ShardedKmerCounter(
        k=meta["k"], n_shards=meta["n_shards"], l=meta["l"], s=meta["s"],
        backend=meta["backend"], batch_words=batch_words,
        n_policy=meta["n_policy"], identity_hash=meta["identity_hash"],
        canonical=meta.get("canonical", False),
        collapse_homopolymers=meta.get("collapse_hp", True),
        lsm=meta.get("lsm", False) or None,  # False -> auto (counter rule)
        lsm_growth=meta.get("lsm_growth", 8),
        merge_every=meta.get("merge_every", 4),
        max_reprobes=meta.get("max_reprobes") or 64,
        routing_hash=meta.get("routing_hash", "gf2"),
        devices=devices,
    )
    _restore_hash(counter, data)
    ref_state = counter._read_state
    state_cls = type(ref_state)
    sharding = NamedSharding(counter.mesh, P(SHARD_AXIS))
    loaded = state_cls(
        **{
            name: jax.device_put(_state_array(name, data), sharding)
            for name in ref_state._fields
        }
    )
    if counter.lsm:
        counter.state[-1] = loaded
    else:
        counter.state = loaded
    return counter
