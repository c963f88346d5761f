"""Populate the persistent JAX compile cache from short-lived processes.

Runs each test file in its own pytest process so a cold cache can be warmed
incrementally (and a failure in one file doesn't lose the others' cache
entries).  After one pass every program the suite compiles is cached and
full-suite runs are fast.  See tests/conftest.py for the mapping-count
bound that keeps long full-suite processes stable.

Usage:  python tools/warm_compile_cache.py [test_file ...]
"""

import os
import pathlib
import subprocess
import sys
import time


def main(argv):
    tests_dir = pathlib.Path(__file__).resolve().parent.parent / "tests"
    files = [tests_dir / a for a in argv] if argv else sorted(
        tests_dir.glob("test_*.py"))
    env = dict(os.environ)
    failed = []
    for f in files:
        t0 = time.monotonic()
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", str(f), "-q", "--no-header"],
            env=env, cwd=tests_dir.parent, capture_output=True, text=True)
        dt = time.monotonic() - t0
        status = "ok" if proc.returncode == 0 else f"FAIL rc={proc.returncode}"
        print(f"{f.name:32s} {dt:7.1f}s  {status}", flush=True)
        if proc.returncode != 0:
            failed.append(f.name)
            print(proc.stdout[-2000:], file=sys.stderr)
    if failed:
        print(f"failed: {', '.join(failed)}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
