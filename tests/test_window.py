"""Pin the driver-window bookkeeping (ADVICE r5 #1): every registry
entry without a CORRECTNESS_r*.json row must sort inside the driver's
50-entry check window, and the declared verified set must equal the
artifact union (no hand-maintained drift)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_math_holds():
    proc = subprocess.run(
        [sys.executable, "scripts/window_check.py"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
