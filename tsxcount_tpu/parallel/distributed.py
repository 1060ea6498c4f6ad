"""Multi-host counting: jax.distributed + per-host input striping.

The reference is single-node shared-memory only (SURVEY.md §2.3); this module
is the "beyond the reference" scale-out path.  Design:

  * one SPMD program: `jax.distributed.initialize` then the same
    ShardedKmerCounter step over a mesh spanning every process's devices —
    XLA routes the all_to_all over ICI within a slice and DCN across hosts;
  * input splits by *byte offset*: each host opens only its 1/N byte range
    of the (shared) file and the native parser resyncs to a record boundary
    (FASTQ 4-line discipline, see _native/fastxpack.cpp fxp_open_range) —
    total parse work is O(file)/host, the chunked-reader analog of the
    reference's streaming FASTXreader (src/mains/main.cpp:132-218);
  * gzip input (not seekable) and the no-native fallback stripe by *record
    index* instead: each host parses everything but packs only records
    where (index // stride) % n_hosts == host_id — N× parse work, exact
    semantics, works on any stream;
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


def host_input_mode(path: str | Path) -> str:
    """'range' (byte-offset split, O(file)/host parse) when the native
    reader can seek this file, else 'stripe' (record striping)."""
    from tsxcount_tpu.io.native import is_gzip, native_available

    return "range" if native_available() and not is_gzip(path) else "stripe"


def count_file_distributed(counter, path: str | Path,
                           stride: int = 64) -> str:
    """Feed a ShardedKmerCounter its host-local share of `path`.

    SPMD discipline: every process must dispatch the SAME number of global
    steps (each step contains collectives), but per-host shares pack into
    different batch counts.  So each host packs its share fully, the global
    maximum batch count is agreed via allgather, and shorter hosts pad with
    empty batches.  With process_count == 1 this degenerates to
    counter.count_file.  Returns the input mode used ('range'/'stripe').
    """
    import numpy as np

    host, n_hosts = jax.process_index(), jax.process_count()
    mode = host_input_mode(path)
    if mode == "range":
        from tsxcount_tpu.io.native import NativeFileReader, split_ranges

        from tsxcount_tpu.io.packer import add_stats

        start, end = split_ranges(path, n_hosts)[host]
        reader = NativeFileReader(
            path, counter.batch, n_policy=counter.n_policy,
            seed=counter.seed, threads=counter.threads,
            byte_start=start, byte_end=end,
            collapse=counter.collapse_hp,
        )
        batches = list(reader)
        # host-local ingest stats, accumulated; globals (total_kmers,
        # stats(), hp bonus) come from the counter's cross-process sum
        counter.packer.stats = add_stats(counter.packer.stats, reader.stats)
    else:
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
    return mode


def _empty_batch(batch_spec):
    from tsxcount_tpu.io.packer import PackedBatch

    return PackedBatch.empty(batch_spec)
