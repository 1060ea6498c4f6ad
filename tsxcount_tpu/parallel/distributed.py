"""Multi-host counting: jax.distributed + per-host input striping.

The reference is single-node shared-memory only (SURVEY.md §2.3); this module
is the "beyond the reference" scale-out path.  Design:

  * one SPMD program: `jax.distributed.initialize` then the same
    ShardedKmerCounter step over a mesh spanning every process's devices —
    XLA routes the all_to_all over ICI within a slice and DCN across hosts;
  * input is striped by *record index*: each host parses the (shared) FASTQ
    but packs only records where (index // stride) % n_hosts == host_id.
    Works for gzip streams too (no seeking needed), keeps window semantics
    exact because records never split across hosts;
  * per-host packed batches become the host's slice of the global batch
    array via jax.make_array_from_process_local_data.

On a single process this degenerates to ShardedKmerCounter exactly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import jax

from tsxcount_tpu.io.fastx import SeqRecord, read_fastx


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed (no-op if already initialized or if no
    coordinator is configured).  Returns (process_id, process_count)."""
    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def striped_records(path: str | Path, host_id: int, n_hosts: int,
                    stride: int = 64) -> Iterator[SeqRecord]:
    """Yield only this host's stripe of records (index//stride mod n_hosts).

    Contiguous stripes of `stride` records keep per-host batches dense while
    balancing read-length variance across hosts.
    """
    for i, rec in enumerate(read_fastx(path)):
        if (i // stride) % n_hosts == host_id:
            yield rec


def count_file_distributed(counter, path: str | Path,
                           stride: int = 64) -> None:
    """Feed a ShardedKmerCounter its host-local stripe of `path`.

    SPMD discipline: every process must dispatch the SAME number of global
    steps (each step contains collectives), but read stripes pack into
    different batch counts per host.  So each host packs its stripe fully,
    the global maximum batch count is agreed via allgather, and shorter
    hosts pad with empty batches.  With process_count == 1 this degenerates
    to counter.count_file.
    """
    import numpy as np

    host, n_hosts = jax.process_index(), jax.process_count()
    batches = []
    for rec in striped_records(path, host, n_hosts, stride):
        batches.extend(counter.packer.feed(rec.seq))
    batches.extend(counter.packer.finish())

    if n_hosts > 1:
        from jax.experimental import multihost_utils

        counts = np.asarray(multihost_utils.process_allgather(
            np.asarray([len(batches)], np.int64)
        )).reshape(-1)
        target = int(counts.max())
        while len(batches) < target:
            batches.append(_empty_batch(counter.batch))

    counter._pending.extend(batches)
    counter._dispatch_pending(force=True)
    counter.finish()


def _empty_batch(batch_spec):
    from tsxcount_tpu.io.packer import PackedBatch

    return PackedBatch.empty(batch_spec)
