"""Smoke tests for the plotting helpers (reference `example/utils.jl:5-58`,
`example/SyntheticTargets.jl:12-19`)."""

import jax
import pytest

matplotlib = pytest.importorskip("matplotlib")

import normalizingflows as nf  # noqa: E402
from normalizingflows.jl_tpu.utils import viz  # noqa: E402


def test_compare_trained_and_untrained_flow(tmp_path, key):
    target = nf.Banana(2, 1.0, 10.0)
    k1, k2 = jax.random.split(key)
    f1 = nf.realnvp(k1, 2, (8,), nlayers=1)
    f2 = nf.realnvp(k2, 2, (8,), nlayers=1)
    out = tmp_path / "cmp.png"
    fig = viz.compare_trained_and_untrained_flow(
        f1, f2, target, key, n_samples=50, save_to=str(out)
    )
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)


def test_visualize_target(tmp_path, key):
    target = nf.WarpedGauss()
    out = tmp_path / "viz.png"
    fig = viz.visualize(target, key=key, n_samples=64, grid_res=40,
                        save_to=str(out))
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)


def test_plot_losses(tmp_path):
    import numpy as np

    stats = {"iteration": np.arange(1, 101),
             "loss": np.linspace(100.0, 1.0, 100)}
    out = tmp_path / "loss.png"
    fig = viz.plot_losses(stats, save_to=str(out))
    assert out.exists() and out.stat().st_size > 0
    matplotlib.pyplot.close(fig)
