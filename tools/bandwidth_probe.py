"""Single-box scaling ceiling probe (BENCH/BASELINE.md evidence).

Three workloads at N and 4N worker PROCESSES (no GIL), same per-worker
work:
  compute — SHA-256 over a 64 KB buffer (fits in L2; no shared-resource
            traffic). Scaling here measures the box + scheduler only.
  stream  — big-array multiply-copy (256 MB, far beyond L3; sequential
            DRAM streaming).
  gather  — random-index gather over a 256 MB array (latency-bound random
            access; thrashes the SHARED L3 and memory controllers — the
            access pattern of hash shuffles and string-heavy aggregation).

A real 4N-executor cluster multiplies L3, memory channels, and heaps along
with cores; one box does not. Whichever workload stops scaling here is the
hardware ceiling the single-box ladder inherits, independent of Spark.

Usage: python tools/bandwidth_probe.py [N] [4N]   (defaults 2 8)
Prints one JSON line with throughputs + scaling ratios.
"""

from __future__ import annotations

import json
import sys
import time
from concurrent.futures import ProcessPoolExecutor


def _compute_work(n_iter: int) -> int:
    import hashlib

    buf = b"x" * 65536
    h = b""
    for _ in range(n_iter):
        h = hashlib.sha256(buf).digest()
    return h[0]


def _stream_work(n_iter: int) -> float:
    import numpy as np

    a = np.arange(256 * 1024 * 1024 // 8, dtype=np.float64)
    s = 0.0
    for _ in range(n_iter):
        b = a * 1.0000001
        s += float(b[-1])
        a = b
    return s


def _gather_work(n_iter: int) -> float:
    import numpy as np

    n = 256 * 1024 * 1024 // 8
    rng = np.random.default_rng(7)
    a = np.arange(n, dtype=np.float64)
    idx = rng.integers(0, n, size=n // 4)  # random 64 MB of indices
    s = 0.0
    for _ in range(n_iter):
        s += float(a[idx].sum())
    return s


def _run(fn, workers: int, n_iter: int) -> float:
    """-> aggregate work-units/sec across `workers` separate processes."""
    t0 = time.time()
    with ProcessPoolExecutor(max_workers=workers) as ex:
        list(ex.map(fn, [n_iter] * workers))
    return workers * n_iter / (time.time() - t0)


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    factor = hi / lo
    out = {"workers": [lo, hi]}
    for name, fn, n_iter in (
        ("compute_sha64k", _compute_work, 40_000),
        ("stream_256mb", _stream_work, 24),
        ("gather_256mb", _gather_work, 12),
    ):
        a = _run(fn, lo, n_iter)
        b = _run(fn, hi, n_iter)
        out[name] = {
            "per_sec_lo": round(a, 1),
            "per_sec_hi": round(b, 1),
            "speedup": round(b / a, 3),
            "efficiency": round(b / a / factor, 3),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
