#!/usr/bin/env python
"""Run the FULL test suite green in one command (VERDICT r3 item 2).

A single-process `pytest tests/` run exhausts XLA compile-cache/arena
resources on this 1-CPU box and segfaults (RC=139) after ~110 tests —
every test passes when the run is split.  This runner partitions the test
FILES across sequential pytest subprocesses (fresh XLA state per batch),
streams their output, and fails loudly on any non-zero child, including
signal deaths.

    python tests/run_all.py            # whole suite
    python tests/run_all.py -k expr    # forwarded to every batch
    GBP_RUNALL_BATCH=3 python tests/run_all.py   # files per batch

The on-chip lane (tests/tpu, GBP_ON_TPU=1) is separate and unaffected —
see README "On-chip kernel checks".
"""
from __future__ import annotations

import glob
import os
import signal
import subprocess
import sys
import time

# Files per subprocess.  The segfault historically hits after ~110 tests
# in ONE process; batches of <=4 files stay far below that while keeping
# interpreter/jax startup (~10 s) amortized.  Heavy files get a batch of
# their own via the singles list below.
BATCH = int(os.environ.get("GBP_RUNALL_BATCH", "4"))
# Known-heavy files (long XLA compiles / many devices): isolate so a batch
# never accumulates two of them.
SINGLES = {
    "test_online.py",
    "test_multihost.py",
    "test_halo_cm.py",
    "test_halo_schedules.py",
    "test_cli.py",
    "test_examples.py",
}


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    files = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(here, "test_*.py"))
    )
    extra = sys.argv[1:]
    batches: list[list[str]] = []
    cur: list[str] = []
    for f in files:
        if f in SINGLES:
            batches.append([f])
            continue
        cur.append(f)
        if len(cur) >= BATCH:
            batches.append(cur)
            cur = []
    if cur:
        batches.append(cur)

    t0 = time.time()
    failed: list[tuple[list[str], int]] = []
    timings: list[tuple[float, int, list[str]]] = []
    for i, batch in enumerate(batches):
        # --durations=3 prints each batch's slowest tests so compile-time
        # regressions are visible per batch (VERDICT r4 item 6).
        cmd = [sys.executable, "-m", "pytest", "-q", "--durations=3",
               *(os.path.join(here, f) for f in batch), *extra]
        print(f"\n=== batch {i + 1}/{len(batches)}: {' '.join(batch)} ===",
              flush=True)
        tb = time.time()
        rc = subprocess.call(cmd, cwd=os.path.dirname(here))
        timings.append((time.time() - tb, i + 1, batch))
        if rc != 0:
            sig = -rc if rc < 0 else None
            name = signal.Signals(sig).name if sig else None
            print(f"!!! batch FAILED rc={rc}"
                  + (f" (killed by {name})" if name else ""), flush=True)
            failed.append((batch, rc))
    dt = time.time() - t0
    print("\nslowest batches:")
    for bt, n, batch in sorted(timings, reverse=True)[:5]:
        print(f"  {bt:6.0f}s  batch {n}: {' '.join(batch)}")
    if failed:
        print(f"\nFAILED: {len(failed)}/{len(batches)} batches in {dt:.0f}s")
        for batch, rc in failed:
            print(f"  rc={rc}: {' '.join(batch)}")
        return 1
    print(f"\nALL {len(batches)} batches green in {dt:.0f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
