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


def test_every_cli_parser_builds_and_prints_help():
    """Each CLI's argparse surface must construct (catches duplicate /
    conflicting flags between make_parser and per-CLI add_argument —
    regressed once when --mesh-data moved into make_parser while
    cli/serve still defined its own)."""
    import contextlib
    import io

    with open("pyproject.toml", "rb") as f:
        proj = tomllib.load(f)["project"]
    for name, target in proj["scripts"].items():
        mod_name, func_name = target.split(":")
        main = getattr(importlib.import_module(mod_name), func_name)
        buf = io.StringIO()
        try:
            with contextlib.redirect_stdout(buf):
                main(["--help"])
        except SystemExit as e:
            assert e.code == 0, f"{name}: --help exited {e.code}"
        assert "usage:" in buf.getvalue(), f"{name}: no usage in --help"


def test_package_metadata_consistent():
    with open("pyproject.toml", "rb") as f:
        data = tomllib.load(f)
    proj = data["project"]
    assert proj["name"] == "captionax"
    # the 'all' extra must be the union of the individual extras
    extras = proj["optional-dependencies"]
    union = {d for k, v in extras.items() if k != "all" for d in v}
    assert set(extras["all"]) == union
