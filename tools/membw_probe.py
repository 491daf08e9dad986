"""Machine probe: how far does BANDWIDTH-bound numpy work scale on this
sandbox, vs pure-compute work?

Columnar encode kernels (cumsum/unique/copy over int32 streams) are
memory-bandwidth-heavy. This probe shows the sandbox's aggregate
bandwidth envelope so the N-vs-4N scaling measurement in bench.py
--scaling can be interpreted correctly: if aggregate iters/s stops
growing past K processes, core counts beyond K cannot demonstrate job
scaling regardless of engine design — pick N and 4N inside the envelope
(the driver instruction's "N and 4N cores").

Usage: python tools/membw_probe.py   # prints one JSON line
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np


def _bw(_):
    a = np.arange(6_000_000, dtype=np.int64) % 50_257
    a = a.astype(np.int32)
    t0 = time.time()
    n = 0
    while time.time() - t0 < 3.0:
        a.copy()
        np.cumsum(a, dtype=np.int64)
        np.unique(a[:500_000])
        n += 1
    return n


def _burn(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 2.0:
        for i in range(10_000):
            x += i * i
    return x


def bandwidth_at(procs: int) -> float:
    """Aggregate bandwidth-bound iters/s at ``procs`` concurrent numpy
    streams — callable from bench.py --scaling to measure the machine's
    SAME-SESSION scaling ceiling (the multi-tenant host's envelope moves
    between sessions; a job efficiency is only interpretable against the
    ceiling measured next to it)."""
    t0 = time.time()
    with mp.Pool(procs) as p:
        iters = p.map(_bw, range(procs))
    return sum(iters) / (time.time() - t0)


def main() -> None:
    out = {"bandwidth": {}, "compute_wall": {}}
    for procs in (1, 2, 8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            iters = p.map(_bw, range(procs))
        dt = time.time() - t0
        out["bandwidth"][procs] = {
            "agg_iters_per_sec": round(sum(iters) / dt, 1),
            "per_proc": round(sum(iters) / dt / procs, 2),
        }
    for procs in (1, 8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, range(procs))
        out["compute_wall"][procs] = round(time.time() - t0, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
