"""Native C++ data loader + MLE training tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import normalizingflows as nf
from normalizingflows.jl_tpu.train import train_flow_mle
from normalizingflows.jl_tpu.utils.data import (
    NativeLoader,
    NumpyLoader,
    make_loader,
    to_raw_file,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    rng = np.random.default_rng(0)
    data = (rng.standard_normal((1000, 3)) * [1.0, 2.0, 0.5]
            + [3.0, -1.0, 0.0]).astype(np.float32)
    path = str(tmp_path_factory.mktemp("data") / "train.f32")
    to_raw_file(path, data)
    return path, data


def test_native_loader_builds_and_iterates(dataset):
    path, data = dataset
    loader = NativeLoader(path, 1000, 3, batch=64, seed=1)
    seen = [next(loader) for _ in range(20)]
    loader.close()
    batches = np.stack(seen)
    assert batches.shape == (20, 64, 3)
    # batches draw real rows: every row must appear in the dataset
    flat = batches.reshape(-1, 3)
    data_set = {tuple(np.round(r, 5)) for r in data}
    for r in flat[:100]:
        assert tuple(np.round(r, 5)) in data_set


def test_native_loader_epoch_covers_all_rows(dataset):
    path, data = dataset
    loader = NativeLoader(path, 1000, 3, batch=100, seed=2)
    rows = np.concatenate([next(loader) for _ in range(10)])  # one epoch
    loader.close()
    # a full epoch is a permutation: every row exactly once
    assert rows.shape == (1000, 3)
    order_o = np.lexsort(np.round(data, 5).T)
    order_r = np.lexsort(np.round(rows, 5).T)
    np.testing.assert_allclose(rows[order_r], data[order_o], atol=1e-6)


def test_native_loader_shuffles_between_epochs(dataset):
    path, _ = dataset
    loader = NativeLoader(path, 1000, 3, batch=1000, seed=3)
    e1 = next(loader)
    e2 = next(loader)
    loader.close()
    assert not np.allclose(e1, e2)  # different permutations
    assert loader is not None


def test_numpy_fallback_equivalence(dataset):
    _, data = dataset
    loader = NumpyLoader(data, batch=128, seed=4)
    b = loader.next_batches(3)
    assert b.shape == (3, 128, 3)


def test_make_loader_dispatch(dataset, tmp_path):
    path, data = dataset
    l1 = make_loader(path, 32, n_rows=1000, dim=3)
    l2 = make_loader(data, 32)
    assert next(l1).shape == (32, 3)
    assert next(l2).shape == (32, 3)
    l1.close()


def test_mle_training_recovers_gaussian(dataset):
    """Forward-KL training on data: a mean-field flow must recover the
    data-generating loc/scale (reference loglikelihood objective,
    `src/objectives/loglikelihood.jl` + the dataloader TODO)."""
    path, data = dataset
    loader = make_loader(path, 100, n_rows=1000, dim=3, seed=5)
    flow = nf.create_flow(
        [nf.Scale(jnp.ones((3,))), nf.Shift(jnp.zeros((3,)))],
        nf.DiagNormal.standard(3),
    )
    res = train_flow_mle(
        flow, loader, max_iters=1500, optimizer=optax.adam(5e-2),
        check_every=250,
    )
    shift = np.asarray(res.flow.bijector.bijectors[1].b)
    scale = np.abs(np.asarray(res.flow.bijector.bijectors[0].a))
    np.testing.assert_allclose(shift, data.mean(0), atol=0.15)
    np.testing.assert_allclose(scale, data.std(0), atol=0.15)
    # nll decreased
    assert res.stats["loss"][-1] < res.stats["loss"][0]
