"""README performance numbers must be generated from the committed
artifacts, never hand-edited (round-4 verdict: two README cells drifted
ahead of the refreshed JSONs)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_readme_in_sync_with_artifacts():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "gen_readme.py"),
         "--check"],
        capture_output=True,
        text=True,
    )
    assert out.returncode == 0, out.stderr + out.stdout
