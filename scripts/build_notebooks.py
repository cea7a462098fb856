"""Generate Jupyter notebooks from the percent-format tutorial scripts.

The reference ships its tutorials as notebooks
(``/root/reference/examples/tutorial_notebooks/*.ipynb``); here the
scripts under ``examples/tutorials/`` are the source of truth (they are
rot-guarded by ``tests/test_examples_cli.py``) and the notebooks are
generated from them:

    python scripts/build_notebooks.py            # writes examples/tutorial_notebooks/
    python scripts/build_notebooks.py --check    # exit 1 if out of sync

Cell convention: ``# %% <text>`` starts a section; the marker text plus
the immediately following full-line comments become a markdown cell and
the rest of the section a code cell. The module docstring becomes the
intro markdown cell. The ``__file__``-based sys.path boilerplate is
rewritten to its notebook-safe ``os.getcwd()`` equivalent.
"""

import argparse
import ast
import json
import os
import sys

TUTORIALS = os.path.join(os.path.dirname(__file__), "..", "examples",
                         "tutorials")
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "examples",
                       "tutorial_notebooks")

# mirror the reference notebooks' file names (case included)
NAME_MAP = {
    "training_a_cvae_model": "training_a_CVAE_model",
    "training_a_mhvae_model": "training_a_MHVAE_model",
}


def _md_cell(text):
    return {"cell_type": "markdown", "metadata": {},
            "source": text.splitlines(keepends=True)}


def _code_cell(code):
    return {"cell_type": "code", "execution_count": None, "metadata": {},
            "outputs": [], "source": code.splitlines(keepends=True)}


def _strip_invocation(doc):
    """Drop the trailing 'python examples/...' usage block from a module
    docstring (meaningless inside a notebook)."""
    lines = doc.rstrip().splitlines()
    while lines and (not lines[-1].strip()
                     or lines[-1].strip().startswith("python ")):
        lines.pop()
    if lines and lines[-1].rstrip().endswith("::"):
        lines[-1] = lines[-1].rstrip()[:-2] + "."
    return "\n".join(lines).rstrip()


def convert(path):
    src = open(path).read()
    tree = ast.parse(src)
    doc = ast.get_docstring(tree) or ""

    body = src
    # remove the docstring literal from the source
    if doc and tree.body and isinstance(tree.body[0], ast.Expr):
        end = tree.body[0].end_lineno
        body = "\n".join(src.splitlines()[end:])
    # notebook-safe path bootstrap
    body = body.replace("os.path.dirname(__file__)", "os.getcwd()")

    stem = os.path.basename(path)[:-3]
    intro = f"# {NAME_MAP.get(stem, stem).replace('_', ' ')}\n\n" \
            + _strip_invocation(doc)
    cells = [_md_cell(intro)]

    sections = []  # list of (marker_text_or_None, [lines])
    current = (None, [])
    for line in body.splitlines():
        if line.startswith("# %%"):
            sections.append(current)
            current = (line[4:].strip(), [])
        else:
            current[1].append(line)
    sections.append(current)

    for marker, lines in sections:
        md = []
        if marker:
            md.append(marker)
            while lines and lines[0].startswith("# "):
                md.append(lines.pop(0)[2:])
            while lines and lines[0].strip() == "#":
                lines.pop(0)
        code = "\n".join(lines).strip("\n")
        if md:
            cells.append(_md_cell("**" + md[0] + "**\n\n"
                                  + "\n".join(md[1:]).rstrip()))
        if code:
            cells.append(_code_cell(code))

    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3",
                           "language": "python", "name": "python3"},
            "language_info": {"name": "python"},
        },
        "nbformat": 4,
        "nbformat_minor": 2,
    }


def build(out_dir=OUT_DIR):
    os.makedirs(out_dir, exist_ok=True)
    written = []
    for fname in sorted(os.listdir(TUTORIALS)):
        if not fname.endswith(".py"):
            continue
        stem = fname[:-3]
        nb = convert(os.path.join(TUTORIALS, fname))
        out = os.path.join(out_dir, NAME_MAP.get(stem, stem) + ".ipynb")
        with open(out, "w") as f:
            json.dump(nb, f, indent=1, sort_keys=True)
            f.write("\n")
        written.append(out)
    return written


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="verify committed notebooks match the scripts")
    args = ap.parse_args()
    if not args.check:
        for p in build():
            print("wrote", p)
        return
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fresh = build(td)
        stale = []
        for p in fresh:
            committed = os.path.join(OUT_DIR, os.path.basename(p))
            if (not os.path.exists(committed)
                    or open(committed).read() != open(p).read()):
                stale.append(committed)
        if stale:
            print("out of sync (re-run scripts/build_notebooks.py):")
            for p in stale:
                print(" ", p)
            sys.exit(1)
        print("notebooks in sync")


if __name__ == "__main__":
    main()
