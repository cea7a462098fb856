"""The generated API reference (docs/api/) must stay in sync with the code:
every public export documented, regenerated output identical to what is
checked in (VERDICT r1 item 9)."""

import importlib.util
import os

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _load_generator():
    spec = importlib.util.spec_from_file_location(
        "generate_api_reference",
        os.path.join(REPO, "scripts", "generate_api_reference.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_api_reference_is_fresh(tmp_path):
    gen = _load_generator()
    coverage = gen.generate(str(tmp_path))
    for slug, modname, _ in gen.SECTIONS:
        fresh = (tmp_path / f"{slug}.md").read_text()
        checked_in_path = os.path.join(REPO, "docs", "api", f"{slug}.md")
        assert os.path.exists(checked_in_path), (
            f"docs/api/{slug}.md missing — run "
            "scripts/generate_api_reference.py")
        checked_in = open(checked_in_path).read()
        assert fresh == checked_in, (
            f"docs/api/{slug}.md is stale — rerun "
            "scripts/generate_api_reference.py")
        # and every export is actually documented in the page
        for name in coverage[modname]:
            assert f"### `{name}" in fresh, (modname, name)


def test_api_reference_covers_model_zoo(tmp_path):
    """All 14 families + their configs appear in the models page."""
    page = open(os.path.join(REPO, "docs", "api", "models.md")).read()
    for family in ("CVAE", "JMVAE", "TELBO", "MVAE", "MMVAE", "MoPoE",
                   "MVTCAE", "DMVAE", "JNF", "MMVAEPlus", "Nexus", "CMVAE",
                   "MHVAE", "CRMVAE"):
        assert f"### `{family}`" in page, family
        assert f"### `{family}Config`" in page, family


def _load_notebook_builder():
    spec = importlib.util.spec_from_file_location(
        "build_notebooks",
        os.path.join(REPO, "scripts", "build_notebooks.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_tutorial_notebooks_are_fresh(tmp_path):
    """The committed .ipynb tutorials are generated from the (rot-guarded)
    scripts; regeneration must be a no-op."""
    builder = _load_notebook_builder()
    fresh = builder.build(str(tmp_path))
    # the reference's 7 tutorial notebooks + the TPU performance-tuning
    # tutorial (no reference counterpart)
    assert len(fresh) == 8
    for p in fresh:
        committed = os.path.join(REPO, "examples", "tutorial_notebooks",
                                 os.path.basename(p))
        assert os.path.exists(committed), (
            f"{committed} missing — run scripts/build_notebooks.py")
        assert open(p).read() == open(committed).read(), (
            f"{committed} stale — rerun scripts/build_notebooks.py")


def test_tutorial_notebooks_structure():
    """Each notebook is valid nbformat-4 JSON with an intro markdown cell,
    narration cells, and runnable-looking code cells."""
    import json

    nbdir = os.path.join(REPO, "examples", "tutorial_notebooks")
    names = sorted(f for f in os.listdir(nbdir) if f.endswith(".ipynb"))
    ref_names = [
        "computing_visualization_and_metrics.ipynb",
        "getting_started.ipynb",
        "learning_with_partial_data.ipynb",
        "tpu_performance_tuning.ipynb",  # beyond-reference addition
        "training_a_CVAE_model.ipynb",
        "training_a_MHVAE_model.ipynb",
        "use_wandb.ipynb",
        "using_samplers.ipynb",
    ]
    assert names == ref_names  # the reference's 7 notebooks + perf tuning
    for f in names:
        nb = json.load(open(os.path.join(nbdir, f)))
        assert nb["nbformat"] == 4
        kinds = [c["cell_type"] for c in nb["cells"]]
        assert kinds[0] == "markdown"
        assert kinds.count("code") >= 2, f
        assert kinds.count("markdown") >= 2, f
        for c in nb["cells"]:
            if c["cell_type"] == "code":
                compile("".join(c["source"]), f, "exec")
