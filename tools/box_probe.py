"""3-second box-phase probe.

The shared host oscillates in phases (identical 2M pipeline draws
132-324 s across one day) with <0.3% CPU steal and an idle local disk
— i.e. the contention is host-level memory bandwidth / cache, which
no guest counter exposes directly. This probe times two
phase-sensitive microbenchmarks:

* ``fault_gbps`` — FIRST-TOUCH speed: writing a fresh 256 MB buffer
  (page-fault path — the hypervisor supplying new pages)
* ``copy_gbps``  — steady-state memcpy between RESIDENT buffers
  (streaming memory bandwidth once pages exist)
* ``alloc_mops`` — small-object alloc/free churn (allocator+cache)

Calibration on this VM: clean phase ≈ 9-11 copy_gbps and ≈ 2-5
fault_gbps. The two DIVERGE in the worst degraded phases (r5
decomposition, 2026-08-17): steady-state copy stayed at 9.6 GiB/s
while first-touch collapsed ~1000x (256 MB np.ones took 28.5 s,
≈ 0.009 GiB/s) — host-level memory overcommit starving fresh-page
supply, not bandwidth saturation. Warm JVMs with resident heaps run
at full speed through such a phase; anything spawning a FRESH JVM
(the per-leg scaling subprocesses) crawls. Gate fresh-JVM harnesses
on BOTH numbers; see also the -XX:+AlwaysPreTouch note in
tools/bench_scaling.py, which moves the fault cost out of the timed
region entirely.

Usage: python tools/box_probe.py [--json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

FAULT_BYTES = 1 << 28  # 256 MB: big enough to defeat caches, small
# enough that even a collapsed phase answers within ~30 s


def fault_gbps(n_bytes: int = FAULT_BYTES) -> float:
    t0 = time.perf_counter()
    buf = np.ones(n_bytes, dtype=np.uint8)  # first touch of every page
    dt = time.perf_counter() - t0
    del buf
    return (n_bytes / (1 << 30)) / dt


def copy_gbps(n_bytes: int = FAULT_BYTES, reps: int = 4) -> float:
    src = np.ones(n_bytes, dtype=np.uint8)
    dst = np.empty_like(src)
    best = float("inf")
    # rep 0 faults dst in and is discarded via min(); later reps are
    # pure resident-page memcpy
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
    return {"fault_gbps": round(fault_gbps(), 3),
            "copy_gbps": round(copy_gbps(), 2),
            "alloc_mops": round(alloc_mops(), 2),
            "ts": int(time.time())}


if __name__ == "__main__":
    print(json.dumps(probe()) if "--json" in sys.argv
          else probe())
