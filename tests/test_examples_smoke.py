"""Smoke-run every example demo with a tiny iteration budget.

Mirrors the reference's Examples CI, which ``include()``s all five demo
scripts with ``max_iters`` clamped low on every push/PR
(`.github/workflows/Examples.yml:26-42`, `example/demo_RealNVP.jl:55`).
Each demo must run end-to-end (build flow → train a few steps → evaluate
ELBO) and return finite numbers.
"""

import importlib.util
import math
import pathlib
import sys

import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parents[1] / "examples"

DEMOS = [
    "demo_planar_flow",
    "demo_radial_flow",
    "demo_realnvp",
    "demo_neural_spline_flow",
    "demo_hamiltonian_flow",
    "demo_maf_mle",
    "demo_glow",
]


def _load(name):
    spec = importlib.util.spec_from_file_location(name, EXAMPLES / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
@pytest.mark.parametrize("name", DEMOS)
def test_demo_smoke(name):
    mod = _load(name)
    res = mod.main(max_iters=10)
    losses = res.stats["loss"]
    assert len(losses) == 10
    assert all(math.isfinite(float(l)) for l in losses)


def test_demo_realnvp_stl_path():
    """The STL estimator variant of the flagship demo also runs."""
    mod = _load("demo_realnvp")
    res = mod.main(max_iters=5, use_stl=True)
    assert all(math.isfinite(float(l)) for l in res.stats["loss"])
