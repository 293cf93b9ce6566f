"""Packaging surface: every console entry point in pyproject.toml must
resolve to an importable module with a callable ``main``."""

import importlib
import tomllib


def test_console_scripts_resolve():
    with open("pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]
    scripts = proj["scripts"]
    assert len(scripts) >= 19
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_package_metadata_consistent():
    with open("pyproject.toml", "rb") as f:
        data = tomllib.load(f)
    proj = data["project"]
    assert proj["name"] == "captionax"
    # the 'all' extra must be the union of the individual extras
    extras = proj["optional-dependencies"]
    union = {d for k, v in extras.items() if k != "all" for d in v}
    assert set(extras["all"]) == union
