"""End-to-end skew stress (100k-turn hot conversation, local[32]).

Runs tools/skew_stress.py in a subprocess: the pytest session already
holds a local[4] SparkContext and a Python process allows only one, and
the stress is specified to run at local[32]."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_skew_stress_subprocess():
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "skew_stress.py")],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-3000:]
    assert "SKEW-STRESS-OK" in res.stdout, res.stdout[-2000:]
