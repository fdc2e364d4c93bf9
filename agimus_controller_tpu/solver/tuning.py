"""Solver tuning knobs.

The Riccati backward/forward sweeps are sequential `lax.scan`s over the
horizon with tiny per-step bodies; the round-4 profile put ~4.3 ms per SQP
iteration at B=1, T=100 down to per-step overhead rather than FLOPs
(PARITY.md). `lax.scan(..., unroll=k)` is the direct lever, plumbed here
into the sqp/csqp batch sweeps via ``AGIMUS_SCAN_UNROLL``.

Measured result (one v5e chip through the axon tunnel, BENCH_MODE=latency,
T=100, B=8): unroll 1/2/4/10 are indistinguishable — p50 2.1-3.9 ms with
run-to-run variance larger than any unroll effect, and repeated unroll=1
runs spanning 2.08-3.07 ms themselves. The per-iteration cost is dominated
by HOST-side dispatch round-trips (amplified by the tunnel), not device
scan-loop overhead, so the default stays 1 (also keeping XLA:CPU test /
dryrun compile budgets flat). The knob remains for experiments on locally
attached chips where the RTT term is ~100x smaller.
"""

from __future__ import annotations

import os


def scan_unroll(T: int | None = None) -> int:
    """Unroll factor for horizon scans (bounded by T when given)."""
    u = max(1, int(os.environ.get("AGIMUS_SCAN_UNROLL", "1")))
    if T is not None:
        u = min(u, max(1, int(T)))
    return u
