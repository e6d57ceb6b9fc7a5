"""Aggregate memory-bandwidth probe: N processes each repeatedly copy a
256 MB numpy buffer for ~3 s; prints aggregate GB/s per process count.
Quantifies how much usable bandwidth this box adds per core — the
denominator of the scaling-efficiency analysis in BENCH/BASELINE.md.

Usage: python scripts/bw_probe.py [proc_counts...]   (default 1 2 8 32)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _worker(q):
    import numpy as np

    src = np.ones(256 * 1024 * 1024 // 8, dtype=np.float64)
    dst = np.empty_like(src)
    n = 0
    t0 = time.time()
    while time.time() - t0 < 3.0:
        np.copyto(dst, src)
        n += 1
    q.put(n * src.nbytes * 2 / (time.time() - t0))  # read+write bytes


def measure(procs: int) -> float:
    q = mp.Queue()
    ps = [mp.Process(target=_worker, args=(q,)) for _ in range(procs)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


def main():
    counts = [int(x) for x in sys.argv[1:]] or [1, 2, 8, 32]
    out = {}
    for c in counts:
        out[c] = round(measure(c), 1)
    print(json.dumps({"aggregate_memcpy_GBps": out}))


if __name__ == "__main__":
    main()
