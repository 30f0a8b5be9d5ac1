"""One-command round gate: tri-scale oracle check + malformed-input
sweep, with a single PASS/FAIL summary line per stage.

Usage: python scripts/gate_all.py [--skip-sf0.1]

Runs (each as a subprocess so Spark sessions don't collide):
  1. check_oracle.py at sf0.001, sf0.01, sf0.1  (all queries)
  2. check_empty_docs.py                         (malformed planting)
Exit 0 only if every stage is clean — the builder's definition of
"green" for a round artifact.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run(args: list[str]) -> tuple[int, str]:
    r = subprocess.run(
        [sys.executable, *args], capture_output=True, text=True, cwd=REPO
    )
    tail = (r.stdout.strip().splitlines() or [""])[-1]
    if r.returncode != 0:
        # a stage that died before printing its summary (import error,
        # missing testdata, Spark launch failure) reports through
        # stderr — surface its tail or the failure is undiagnosable
        err_tail = " | ".join(r.stderr.strip().splitlines()[-3:])
        tail = f"{tail} [stderr: {err_tail}]" if err_tail else tail
    return r.returncode, tail


def main() -> int:
    scales = ["sf0.001", "sf0.01"]
    if "--skip-sf0.1" not in sys.argv:
        scales.append("sf0.1")
    failed = False
    for sf in scales:
        t0 = time.time()
        rc, tail = run(
            [os.path.join(HERE, "check_oracle.py"), f"--sf=/root/testdata/{sf}"]
        )
        ok = rc == 0
        failed |= not ok
        print(f"{'PASS' if ok else 'FAIL'}  oracle @ {sf}: {tail} "
              f"[{time.time()-t0:.0f}s]")
    t0 = time.time()
    rc, tail = run([os.path.join(HERE, "check_empty_docs.py")])
    ok = rc == 0
    failed |= not ok
    print(f"{'PASS' if ok else 'FAIL'}  malformed sweep: {tail} "
          f"[{time.time()-t0:.0f}s]")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
