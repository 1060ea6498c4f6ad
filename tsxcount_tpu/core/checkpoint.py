"""Count-state checkpointing (save / resume).

The reference has NO persistence: counts live only in process memory and are
consumed by --check (SURVEY.md §5 — `getAllKmers` is the only export).  Here
the full counter state (store/table arrays + hash matrix + config + ingest
stats) round-trips through one .npz file, so long counting jobs can stop and
resume, and count tables can be shipped between machines.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

import jax
import numpy as np

FORMAT_VERSION = 1


def save_counter(counter, path: str | Path) -> None:
    """Serialize a KmerCounter (either backend) to an .npz file."""
    meta = {
        "format": FORMAT_VERSION,
        "k": counter.spec.k,
        "l": counter.l,
        "s": counter.s,
        "backend": counter.backend,
        "n_policy": counter.n_policy,
        "identity_hash": counter.hash_fn.identity,
        "stats": dataclasses.asdict(counter.packer.stats),
        "batches_processed": counter.batches_processed,
        "lsm": getattr(counter, "lsm", False),
    }
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


def load_counter(path: str | Path, batch_words: int = 1 << 16):
    """Rebuild a KmerCounter from an .npz checkpoint; counting can resume."""
    from tsxcount_tpu.core.counter import KmerCounter
    from tsxcount_tpu.io.packer import PackStats

    with np.load(path, allow_pickle=False) as data:
        meta = json.loads(str(data["meta"]))
        if meta["format"] != FORMAT_VERSION:
            raise ValueError(f"unsupported checkpoint format {meta['format']}")
        counter = KmerCounter(
            k=meta["k"], l=meta["l"], s=meta["s"], backend=meta["backend"],
            batch_words=batch_words, n_policy=meta["n_policy"],
            identity_hash=meta["identity_hash"],
            lsm=meta.get("lsm", False),
        )
        # restore the exact hash matrix (layout-defining for table backend)
        counter.hash_fn.matrix = data["hash_matrix"]
        counter.hash_fn.inverse = data["hash_inverse"]
        import jax.numpy as jnp

        counter.hash_fn._mat_t = jnp.asarray(
            counter.hash_fn.matrix.T, dtype=jnp.int8
        )
        counter.hash_fn._inv_t = jnp.asarray(
            counter.hash_fn.inverse.T, dtype=jnp.int8
        )
        ref_state = counter.state[-1] if counter.lsm else counter.state
        state_cls = type(ref_state)
        loaded = state_cls(
            **{
                name: jnp.asarray(data[f"state_{name}"])
                for name in ref_state._fields
            }
        )
        if counter.lsm:
            counter.state = counter.state[:-1] + [loaded]
        else:
            counter.state = loaded
        counter.packer.stats = PackStats(**meta["stats"])
        counter.batches_processed = meta["batches_processed"]
    return counter
