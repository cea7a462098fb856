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
