"""Doc-drift guard: assert README/PERFORMANCE headline numbers match the
latest driver bench record (BENCH_r*.json) and the collected test count.

VERDICT r2 and r3 both flagged headline numbers pasted into prose rotting
against the measured record; this makes the check mechanical.  Checked
claims:

- the segment-parallel pitch throughput (``parsed.value``) formatted with
  thousands separators must appear in README.md and docs/PERFORMANCE.md;
- the exact single-stream throughput (from the bench tail) likewise;
- the upload-inclusive e2e throughput (``parsed.e2e_value``) must appear in
  README.md;
- the spectral relative-MSE exponent quoted in README must match the bench
  tail's measured value at one significant digit;
- README's "N tests" line must match the live collected count
  (``--tests N`` to supply it, ``--collect`` to run pytest collection here;
  skipped otherwise so the in-suite test stays cheap).

Run standalone:  python tools/check_docs.py --collect
In-suite:        tests/test_docs.py calls check_bench_numbers().
Exit code 1 on any mismatch, listing each one.
"""

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_bench():
    paths = glob.glob(os.path.join(ROOT, "BENCH_r*.json"))
    if not paths:
        return None, None
    path = max(paths, key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    with open(path) as f:
        return path, json.load(f)


def _fmt_thousands(v: float) -> str:
    return f"{v:,.0f}"


def check_bench_numbers():
    """Return a list of mismatch strings (empty = docs agree with bench)."""
    path, bench = latest_bench()
    if bench is None:
        return []          # fresh clone without driver records: nothing to pin
    problems = []
    name = os.path.basename(path)
    tail = bench.get("tail", "")
    parsed = bench.get("parsed") or {}

    readme = open(os.path.join(ROOT, "README.md")).read()
    perf = open(os.path.join(ROOT, "docs", "PERFORMANCE.md")).read()

    claims = []
    if "value" in parsed:
        claims.append(("segment-parallel frames/s",
                       _fmt_thousands(parsed["value"]),
                       [("README.md", readme), ("docs/PERFORMANCE.md", perf)]))
    m = re.search(r"single stream: .*-> ([\d,]+) frames/s", tail)
    if m:
        claims.append(("single-stream frames/s", m.group(1),
                       [("README.md", readme), ("docs/PERFORMANCE.md", perf)]))
    if "e2e_value" in parsed:
        claims.append(("e2e upload-inclusive frames/s",
                       _fmt_thousands(parsed["e2e_value"]),
                       [("README.md", readme)]))
    for what, text, targets in claims:
        for fname, body in targets:
            if text not in body:
                problems.append(
                    f"{fname}: {what} '{text}' from {name} not found "
                    f"(stale headline?)")

    # Spectral MSE: compare the quoted exponent/mantissa at 1 sig digit.
    m = re.search(r"spectral relative MSE[^:]*: ([\d.]+)e-(\d+)", tail)
    if m:
        mant, expo = float(m.group(1)), int(m.group(2))
        want = f"{mant:.0f}e-{expo}"
        quoted = re.search(r"relative MSE \*\*([\d.]+)e-(\d+)\*\*", readme)
        if quoted:
            got = f"{float(quoted.group(1)):.0f}e-{int(quoted.group(2))}"
            if got != want:
                problems.append(
                    f"README.md: spectral relative MSE **{quoted.group(0)}** "
                    f"!= bench {want} ({name})")
    return problems


def check_test_count(collected: int):
    """README's 'N tests' claim vs the live collected count."""
    readme = open(os.path.join(ROOT, "README.md")).read()
    m = re.search(r"(\d+) tests", readme)
    if not m:
        return []
    quoted = int(m.group(1))
    if quoted != collected:
        return [f"README.md says '{quoted} tests' but the suite collects "
                f"{collected}"]
    return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tests", type=int, default=None,
                    help="collected test count to check README against")
    ap.add_argument("--collect", action="store_true",
                    help="run pytest --collect-only here to get the count")
    args = ap.parse_args()

    problems = check_bench_numbers()
    collected = args.tests
    if args.collect and collected is None:
        import subprocess
        out = subprocess.run(
            [sys.executable, "-m", "pytest", "tests/", "--collect-only",
             "-q"], cwd=ROOT, capture_output=True, text=True).stdout
        m = re.search(r"(\d+) tests collected", out)
        if m:
            collected = int(m.group(1))
        else:
            problems.append("could not parse pytest --collect-only output")
    if collected is not None:
        problems += check_test_count(collected)

    for p in problems:
        print(f"DOC DRIFT: {p}", file=sys.stderr)
    if problems:
        sys.exit(1)
    print("docs agree with the latest bench record"
          + (f" and {collected} collected tests" if collected else ""))


if __name__ == "__main__":
    main()
