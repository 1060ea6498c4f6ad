#!/usr/bin/env python
"""Analytic multi-chip scaling model with measured single-chip inputs.

BASELINE #5 asks for >= 80% kmers/s scaling efficiency to multi-host at
k=127.  Real multi-chip hardware is not reachable from this environment
(one tunneled v5e chip), so this model composes the measured per-phase
single-chip costs with the sharded pipeline's exchange volume — the same
accounting `analyses/plot_analyses.py:167-178` does for the reference's
thread-scaling plots — and prints projected efficiency per chip count.

Why the model is simple: the sharded design (parallel/sharded.py) is
data-parallel in every per-row phase —

  * each shard packs and H2Ds its OWN read slice (host cores scale with
    chips on real pods: 8 chips + ~100 vCPUs per v5e host);
  * extract + dedupe-sort run on the shard's own P positions (constant
    work per shard, any n);
  * the merge folds the rows the shard RECEIVES: a balanced hash split
    of the same global unique stream, so per-shard merge rows are
    constant too (route_cap * n per flush == capacity_factor * P).

The ONLY terms that grow with n are:
  1. the all_to_all exchange (route_cap * n_shards * row_bytes per batch
     per shard == capacity_factor * P * row_bytes, CONSTANT bytes but
     crossing ICI within a host and DCN beyond);
  2. hash imbalance (measured <= 1.3% on the CPU mesh, shard_scale_*.json);
  3. fixed per-batch dispatch/collective latency (amortized by batch size).

Efficiency(n) = t_compute / (t_compute + t_exchange(n) + t_fixed) / imbalance.

Measured inputs default to the r4/r5 one-chip numbers recorded in
CLAUDE.md / bench_results (amortized phase timings, tools/stepbench.py
and tools/passprofile.py); bandwidth assumptions are stated explicitly
and conservative.
"""

from __future__ import annotations

import argparse
import json

# --- measured single-chip per-batch phase costs (seconds), P=9.63M ------
# k=14: extract+dedupe 55 ms, merge share 40 ms, misc/dispatch 15 ms
# k=127: dedupe sort 114 ms + extract ~20 + merge share ~120 + misc 15
MEASURED = {
    14: dict(compute_s=0.110, row_bytes=8),    # 1 key lane + 1 count col
    31: dict(compute_s=0.125, row_bytes=12),   # 2 lanes + count
    63: dict(compute_s=0.170, row_bytes=20),   # 4 lanes + count
    127: dict(compute_s=0.270, row_bytes=36),  # 8 lanes + count
}
P_BATCH = 9_633_792          # positions per batch (602112 words)
IMBALANCE = 1.013            # worst measured shard_imbalance (CPU mesh)
T_FIXED = 0.010              # per-batch dispatch + collective latency (s)


def efficiency(k: int, n: int, chips_per_host: int, cap_factor: float,
               b_ici: float, b_dcn: float) -> dict:
    m = MEASURED[k]
    bytes_total = cap_factor * P_BATCH * m["row_bytes"]
    if n <= 1:
        t_ex = 0.0
    elif n <= chips_per_host:
        # ICI all_to_all: every byte leaves the chip once (self-shard
        # slice excluded — (n-1)/n of the buffer)
        t_ex = bytes_total * (n - 1) / n / b_ici
    else:
        cross = (n - chips_per_host) / n  # fraction crossing DCN
        t_ex = (
            bytes_total * cross / b_dcn
            + bytes_total * (1 - cross) / b_ici
        )
    t1 = m["compute_s"]
    eff = t1 / (t1 + t_ex + T_FIXED) / IMBALANCE
    return dict(
        k=k, n_chips=n, exchange_mb=round(bytes_total / 1e6, 1),
        t_exchange_ms=round(t_ex * 1e3, 2),
        t_compute_ms=round(t1 * 1e3, 1),
        efficiency_pct=round(100 * eff, 1),
        projected_kmers_per_s=round(n * P_BATCH / (t1 + t_ex + T_FIXED)
                                    / IMBALANCE),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chips-per-host", type=int, default=8)
    ap.add_argument("--cap-factor", type=float, default=1.5,
                    help="routing capacity factor (1.5 = bench default; "
                         "1.1 suffices at >= 16 shards where the "
                         "balanced-split deviation is < 1%%)")
    ap.add_argument("--ici", type=float, default=40e9,
                    help="effective per-chip ICI all_to_all egress B/s "
                         "(v5e: 4 links x ~45 GB/s; 40e9 conservative)")
    ap.add_argument("--dcn", type=float, default=6.25e9,
                    help="effective per-chip DCN B/s (50 GB/s NIC per "
                         "8-chip v5e host)")
    args = ap.parse_args()
    rows = []
    for k in (14, 127):
        for n in (1, 4, 8, 16, 32):
            rows.append(efficiency(
                k, n, args.chips_per_host, args.cap_factor,
                args.ici, args.dcn,
            ))
    print(json.dumps(rows, indent=1))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
