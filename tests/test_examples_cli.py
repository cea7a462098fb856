"""Guards against example-script rot.

Two layers (VERDICT r1 item 6):

- Default-run: every ``examples/**/*.py`` (tutorials included) is parsed and
  every ``multivae_tpu`` import it makes is resolved — module imported,
  attribute looked up — without executing the script body (tutorials train
  at import time, so execution is not an option in the default suite). This
  catches the common rot: a renamed/moved public API.
- ``--runslow``: the full ``--help`` subprocess sweep, which exercises each
  CLI script's complete import surface and argparse wiring.
"""

import ast
import glob
import importlib
import os
import subprocess
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _all_example_scripts():
    return sorted(
        glob.glob(os.path.join(REPO, "examples", "**", "*.py"),
                  recursive=True)
    )


def _resolve_import(module: str, names):
    """Import ``module`` and check each ``from module import name``."""
    mod = importlib.import_module(module)
    missing = []
    for name in names:
        if hasattr(mod, name):
            continue
        try:
            importlib.import_module(f"{module}.{name}")
        except ImportError:
            missing.append(f"{module}.{name}")
    return missing


def test_all_examples_resolve_multivae_imports():
    """Every multivae_tpu import in every example resolves (fast, default)."""
    scripts = _all_example_scripts()
    assert len(scripts) >= 23, scripts  # 8 top-level + 8 case-study + 7 tut
    failures = []
    for path in scripts:
        tree = ast.parse(open(path).read(), filename=path)
        for node in ast.walk(tree):
            if isinstance(node, ast.Import):
                for alias in node.names:
                    if alias.name.split(".")[0] != "multivae_tpu":
                        continue
                    try:
                        importlib.import_module(alias.name)
                    except ImportError as e:
                        failures.append((os.path.relpath(path, REPO),
                                         alias.name, str(e)))
            elif isinstance(node, ast.ImportFrom) and node.level == 0:
                if (node.module or "").split(".")[0] != "multivae_tpu":
                    continue
                try:
                    missing = _resolve_import(
                        node.module, [a.name for a in node.names])
                except ImportError as e:
                    failures.append((os.path.relpath(path, REPO),
                                     node.module, str(e)))
                else:
                    for m in missing:
                        failures.append((os.path.relpath(path, REPO), m,
                                         "attribute not found"))
    assert not failures, failures


def test_examples_compile():
    """Every example byte-compiles (catches syntax rot in non-multivae
    lines the import check doesn't see)."""
    import py_compile

    for path in _all_example_scripts():
        py_compile.compile(path, doraise=True)


@pytest.mark.slow
def test_all_examples_parse_help():
    scripts = [
        s for s in _all_example_scripts()
        if "tutorials" + os.sep not in s  # tutorials run their body
        and os.path.basename(s) != "global_config.py"
    ]
    assert len(scripts) >= 15
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # Drop the axon-plugin trigger entirely: sitecustomize registers the
    # TPU plugin whenever this var is set, and plugin REGISTRATION can
    # block at interpreter start when the tunnel is unreachable —
    # JAX_PLATFORMS=cpu alone doesn't stop it (it gates backend
    # selection, not registration).
    env.pop("PALLAS_AXON_POOL_IPS", None)
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
