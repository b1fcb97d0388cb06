"""Tests for the flatten layer (analog of reference hessianfree/utils.py).

Covers: round-trip, frozen-subset handling, length-mismatch errors
(SURVEY.md build plan step 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import TrainableRavel
from test_utils_hf import freeze_first_layer_mask, init_small_nn

SEEDS = [0, 1, 42]


@pytest.mark.parametrize("seed", SEEDS)
def test_roundtrip_all_trainable(seed):
    params, _, _ = init_small_nn(seed)
    ravel = TrainableRavel(params)
    vec = ravel.ravel(params)
    assert vec.shape == (ravel.dim,)

    rebuilt = ravel.write(params, vec)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(rebuilt)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("seed", SEEDS)
def test_frozen_subset(seed):
    params, _, _ = init_small_nn(seed)
    mask = freeze_first_layer_mask(params)
    ravel = TrainableRavel(params, mask)

    full = TrainableRavel(params)
    n_frozen = params["l1"]["w"].size + params["l1"]["b"].size
    assert ravel.dim == full.dim - n_frozen

    # write: frozen leaves untouched, trainable replaced
    vec = jnp.arange(ravel.dim, dtype=ravel.dtype)
    out = ravel.write(params, vec)
    np.testing.assert_array_equal(
        np.asarray(out["l1"]["w"]), np.asarray(params["l1"]["w"])
    )
    np.testing.assert_array_equal(np.asarray(ravel.ravel(out)), np.asarray(vec))

    # add: zero vector is identity everywhere
    out2 = ravel.add(params, jnp.zeros(ravel.dim, ravel.dtype))
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(out2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # unravel: tangent pytree with zeros at frozen leaves
    tangent = ravel.unravel(vec)
    assert np.all(np.asarray(tangent["l1"]["w"]) == 0)
    np.testing.assert_array_equal(
        np.asarray(ravel.ravel(tangent)), np.asarray(vec)
    )


def test_length_mismatch_raises():
    params, _, _ = init_small_nn(0)
    ravel = TrainableRavel(params)
    with pytest.raises(ValueError):
        ravel.write(params, jnp.zeros(ravel.dim + 1))
    with pytest.raises(ValueError):
        ravel.unravel(jnp.zeros(ravel.dim - 1))


def test_jit_compatible():
    params, _, _ = init_small_nn(0)
    ravel = TrainableRavel(params)

    @jax.jit
    def roundtrip(p):
        return ravel.ravel(ravel.add(p, 2.0 * ravel.ravel(p)))

    out = roundtrip(params)
    np.testing.assert_allclose(
        np.asarray(out), 3.0 * np.asarray(ravel.ravel(params)), rtol=1e-6
    )
