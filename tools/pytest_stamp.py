"""Full-suite-at-final-commit gate (round-9 VERDICT item 1).

Two consecutive rounds ended with a red pytest because the final
commits landed without a full-suite run.  This tool mechanizes the
discipline the same way STRICT_SWEEP_rN's git_head stamp fixed the
sweep: run the ENTIRE suite and write PYTEST_r{N}.json next to it with
pass/fail counts + git_head + git_dirty.  Run it as the LAST step of a
round, after the final source commit:

    python tools/pytest_stamp.py 10        # writes PYTEST_r10.json

A non-zero exit code means the suite is red — do not end the round.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import time


def main() -> int:
    rnd = sys.argv[1] if len(sys.argv) > 1 else "0"
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q",
         "-p", "no:cacheprovider"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    tail = (proc.stdout or "")[-4000:]
    m = re.search(
        r"(?:(\d+) failed, )?(\d+) passed(?:, (\d+) skipped)?"
        r"(?:, (\d+) deselected)?(?:, (\d+) error)?", tail)
    failed = int(m.group(1) or 0) if m else -1
    passed = int(m.group(2) or 0) if m else -1
    errors = int(m.group(5) or 0) if m else -1
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
        cwd="/root/repo").stdout.strip()
    dirty = bool(subprocess.run(
        ["git", "status", "--porcelain"], capture_output=True,
        text=True, cwd="/root/repo").stdout.strip())
    stamp = {
        "git_head": head,
        "git_dirty": dirty,
        "passed": passed,
        "failed": failed,
        "errors": errors,
        "returncode": proc.returncode,
        "wall_sec": round(time.time() - t0, 1),
        "tail": tail.splitlines()[-3:],
    }
    out = f"/root/repo/PYTEST_r{rnd}.json"
    with open(out, "w") as f:
        json.dump(stamp, f, indent=1)
    print(json.dumps(stamp, indent=1))
    print("wrote", out)
    return 0 if proc.returncode == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
