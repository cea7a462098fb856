"""Guard against example-script rot: every example must at least parse
``--help`` (which exercises its full import surface)."""

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


@pytest.mark.slow
def test_all_examples_parse_help():
    scripts = sorted(
        glob.glob(os.path.join(REPO, "examples", "*.py"))
        + glob.glob(os.path.join(REPO, "examples", "case_studies",
                                 "partial_polymnist", "*.py"))
    )
    scripts = [s for s in scripts
               if os.path.basename(s) != "global_config.py"]
    assert len(scripts) >= 15
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    failures = []
    for s in scripts:
        r = subprocess.run(
            [sys.executable, s, "--help"], capture_output=True, text=True,
            cwd=os.path.dirname(s), env=env, timeout=300,
        )
        # scripts without argparse run their body; only import errors and
        # argparse failures count (those exit nonzero with a traceback)
        if r.returncode != 0 and "Error" in (r.stderr or ""):
            ok = ("the following arguments are required" in r.stderr
                  or "dataset is not available" in r.stderr
                  or "Dataset not found" in r.stderr
                  or "files not found" in r.stderr
                  or "No such file" in r.stderr)
            if not ok:
                failures.append((os.path.basename(s), r.stderr[-400:]))
    assert not failures, failures
