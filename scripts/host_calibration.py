"""Host parallel-scaling calibration: the intrinsic N→4N efficiency of the
extraction kernel OUTSIDE Spark.

Runs the per-turn kernel (``ocr_spark.kernels.extract.extract_turn``) over a
fixed payload set in plain multiprocessing workers, each pinned to one core,
at two process counts. The resulting efficiency is the ceiling the sandbox
host imposes on ANY parallel runner of this workload (shared-tenant memory
bandwidth, turbo clocks) — a number a real multi-node cluster does not have,
because every node there owns its own memory bus. The bench reports the
Spark job's measured efficiency next to this ceiling: if the two match, the
Spark orchestration itself loses nothing going N→4N.

Usage: python scripts/host_calibration.py [LO] [HI]  (defaults 4 16)
Prints one JSON line: {"cpus_lo":, "cpus_hi":, "turns_per_sec_lo":,
"turns_per_sec_hi":, "host_eff":}.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

N_PAYLOADS = 256
REPS = 64  # per worker: ~4-5 s of kernel work per level


def _payloads() -> list[tuple[str, str]]:
    from ocr_spark.fixtures import turn_payload

    return [turn_payload(42, i // 8, i % 8) for i in range(N_PAYLOADS)]


def _work(args: tuple[int, int]) -> tuple[int, float]:
    cpu, reps = args
    try:
        os.sched_setaffinity(0, {cpu})
    except OSError:
        pass
    from ocr_spark.kernels.extract import extract_turn

    payloads = _payloads()
    t0 = time.monotonic()
    n = 0
    for _ in range(reps):
        for tool, text in payloads:
            extract_turn(text, tool)
            n += 1
    return n, time.monotonic() - t0


def measure(nproc: int, reps: int = REPS) -> float:
    """Aggregate turns/sec with ``nproc`` single-core-pinned workers."""
    with mp.get_context("spawn").Pool(nproc) as pool:
        t0 = time.monotonic()
        res = pool.map(_work, [(i, reps) for i in range(nproc)])
        wall = time.monotonic() - t0
    return sum(r[0] for r in res) / wall


def main() -> int:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    t_lo = measure(lo)
    t_hi = measure(hi)
    print(
        json.dumps(
            {
                "cpus_lo": lo,
                "cpus_hi": hi,
                "turns_per_sec_lo": round(t_lo, 1),
                "turns_per_sec_hi": round(t_hi, 1),
                "host_eff": round(t_hi / ((hi / lo) * t_lo), 3),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
