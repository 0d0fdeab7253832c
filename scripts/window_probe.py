"""Host-window quality probe (run BEFORE any scaling measurement).

This shared box has noisy-neighbor windows: /tmp (virtual disk) fsync
throughput swings 9 -> 570 MB/s and the memory-stream ceiling moves
with it (see BENCH/BASELINE.md round-2 controls). Timing runs taken
in a bad window under-measure scaling through no fault of the engine.

Prints one JSON line: fsync MB/s on /tmp, single-core ALU ops/s, and
an 8-process memory-stream efficiency sample. Gate: good window ~=
fsync > 150 MB/s AND stream_eff_2to8 > 0.70.
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import tempfile
import time

import numpy as np


def fsync_mbps(path: str = "/tmp", mb: int = 64) -> float:
    buf = os.urandom(1 << 20)
    fd, p = tempfile.mkstemp(dir=path)
    try:
        t0 = time.time()
        with os.fdopen(fd, "wb") as f:
            for _ in range(mb):
                f.write(buf)
            f.flush()
            os.fsync(f.fileno())
        return round(mb / (time.time() - t0), 1)
    finally:
        os.unlink(p)


def alu_ops() -> float:
    t0 = time.time()
    x = 1.0
    for i in range(2_000_000):
        x = x * 1.0000001 + 1e-9
    return round(2_000_000 / (time.time() - t0) / 1e6, 2)


def alu_med(n: int = 3, gap_s: float = 0.7) -> float:
    """Median of n ALU samples spaced gap_s apart (~1.6 s for the
    default). Measured 2026-08-18: this host's contention is BIMODAL
    at a 1-3 s period (samples oscillate ~13-17 <-> ~24-27 Mops
    within one second), so a single 0.1 s sample randomly reads
    either phase — 'clean' single-sample gates fired multi-minute
    scaling attempts into ~70%-duty-cycle contended regimes. The
    median over a multi-second span classifies bimodal flicker as
    dirty while leaving sustained-clean windows untouched."""
    vals = [alu_ops()]
    for _ in range(n - 1):
        time.sleep(gap_s)
        vals.append(alu_ops())
    vals.sort()
    return vals[len(vals) // 2]


def _stream_worker(q):
    a = np.empty(8 << 20, dtype=np.float64)
    b = np.random.default_rng(0).random(8 << 20)
    t0 = time.time()
    for _ in range(10):
        np.copyto(a, b)
        a += 1.0
    q.put(time.time() - t0)


def stream_eff(n_lo: int = 2, n_hi: int = 8) -> float:
    def run(n):
        q = mp.Queue()
        ps = [mp.Process(target=_stream_worker, args=(q,)) for _ in range(n)]
        t0 = time.time()
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        return time.time() - t0

    lo = run(n_lo)
    hi = run(n_hi)
    # perfect scaling: hi wall == lo wall (more work, more procs)
    return round(lo / hi, 3)


def probe(mb: int = 32) -> dict:
    """The light alu+fsync probe every bench artifact embeds — ONE
    definition so probe_before/probe_after fields stay comparable
    across bench.py, bench_scaling.py and bench_scale32.py rows.
    alu_mops is a median-of-3 as of r5-late (see alu_med): single
    samples are bimodal-flicker-prone on this host."""
    return {"alu_mops": alu_med(), "tmp_fsync_mbps": fsync_mbps(mb=mb)}


if __name__ == "__main__":
    out = {
        "tmp_fsync_mbps": fsync_mbps(),
        "alu_mops": alu_ops(),
        "stream_eff_2to8": stream_eff(),
    }
    # scaling-ratio quality: fsync + stream controls; ABSOLUTE-time
    # quality additionally needs an uncontended CPU (observed range on
    # this box: ~14 Mops heavily contended .. ~28 Mops clean)
    out["good_window"] = bool(
        out["tmp_fsync_mbps"] > 150 and out["stream_eff_2to8"] > 0.70
    )
    out["good_cpu_window"] = bool(out["good_window"] and out["alu_mops"] > 24)
    print(json.dumps(out))
