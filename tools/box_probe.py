"""3-second box-phase probe.

The shared host oscillates in phases (identical 2M pipeline draws
132-324 s across one day) with <0.3% CPU steal and an idle local disk
— i.e. the contention is host-level memory bandwidth / cache, which
no guest counter exposes directly. This probe times two
phase-sensitive microbenchmarks:

* ``copy_gbps``  — 1 GiB numpy memcpy (streaming memory bandwidth)
* ``alloc_mops`` — small-object alloc/free churn (allocator+cache)

Calibration on this VM: clean phase ≈ 9-11 copy_gbps; degraded phase
measured during a 300 s (vs clean 132 s) pipeline draw ≈ 4-6. Use it
to GATE official bench/scaling runs: probe, run only if clean, else
sleep and re-probe (tools/run_when_clean.py).

Usage: python tools/box_probe.py [--json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def copy_gbps(n_bytes: int = 1 << 30, reps: int = 3) -> float:
    src = np.ones(n_bytes, dtype=np.uint8)
    dst = np.empty_like(src)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.copyto(dst, src)
        best = min(best, time.perf_counter() - t0)
    return (n_bytes / (1 << 30)) / best


def alloc_mops(n: int = 2_000_000) -> float:
    t0 = time.perf_counter()
    x = [(i, str(i)) for i in range(n)]
    del x
    return n / (time.perf_counter() - t0) / 1e6


def probe() -> dict:
    return {"copy_gbps": round(copy_gbps(), 2),
            "alloc_mops": round(alloc_mops(), 2),
            "ts": int(time.time())}


if __name__ == "__main__":
    print(json.dumps(probe()) if "--json" in sys.argv
          else probe())
