"""Doc-drift guard in the suite: headline numbers quoted in README.md and
docs/PERFORMANCE.md must match the latest driver bench record
(tools/check_docs.py; VERDICT r2/r3 both caught hand-pasted numbers
rotting).  The test-count claim is checked by the standalone CLI
(`python tools/check_docs.py --collect`) so the in-suite check stays
collection-free."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))


def test_readme_matches_latest_bench_record():
    import check_docs
    problems = check_docs.check_bench_numbers()
    assert not problems, "\n".join(problems)
