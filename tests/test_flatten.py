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


def test_padded_ravel_roundtrip_and_alignment():
    """pad_to_multiple: flat space rounds up, tail is zero, unravel/add
    ignore it, round-trips are exact."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchhessianfree_tpu import TrainableRavel
    from pytorchhessianfree_tpu.models.mlp import init_mlp

    params = init_mlp(jax.random.PRNGKey(0), dtype=jnp.float64)
    plain = TrainableRavel(params)
    padded = TrainableRavel(params, pad_to_multiple=1024)

    assert padded.dim % 1024 == 0
    assert padded.unpadded_dim == plain.dim
    assert padded.dim >= plain.dim

    v = padded.ravel(params)
    assert v.shape == (padded.dim,)
    np.testing.assert_array_equal(
        np.asarray(v[plain.dim:]), 0.0
    )  # provably-zero tail
    np.testing.assert_array_equal(
        np.asarray(v[: plain.dim]), np.asarray(plain.ravel(params))
    )

    # unravel/add ignore the tail (even a poisoned one)
    poisoned = v.at[plain.dim:].set(123.0)
    back = padded.unravel(poisoned)
    for a, b in zip(
        jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    bumped = padded.add(params, poisoned)
    for a, b in zip(
        jax.tree_util.tree_leaves(bumped), jax.tree_util.tree_leaves(params)
    ):
        np.testing.assert_allclose(np.asarray(a), 2 * np.asarray(b))


def test_padded_full_step_matches_unpadded():
    """The whole HF step in the padded vector space must follow the plain
    space exactly (same losses/decisions; params equal)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_step,
    )
    from pytorchhessianfree_tpu.models.mlp import init_mlp, mlp_apply, mse_loss

    key = jax.random.PRNGKey(1)
    params = init_mlp(key, dtype=jnp.float64)
    x = jax.random.normal(key, (16, 7), jnp.float64)
    y = jax.random.normal(key, (16, 3), jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=40)

    outs = {}
    for name, ravel in [
        ("plain", TrainableRavel(params)),
        ("padded", TrainableRavel(params, pad_to_multiple=64)),
    ]:
        step = make_hf_step(fns, config, ravel)
        p, s, st = step(params, init_state(ravel, config), (x, y))
        # run a SECOND step so the padded warm start feeds back through CG
        p, s, st2 = step(p, s, (x, y))
        outs[name] = (p, st, st2)

    for st_a, st_b in zip(outs["plain"][1:], outs["padded"][1:]):
        np.testing.assert_allclose(
            float(st_a.init_loss), float(st_b.init_loss), rtol=1e-12
        )
        assert int(st_a.num_cg_iters) == int(st_b.num_cg_iters)
        np.testing.assert_allclose(float(st_a.lr), float(st_b.lr))
    for a, b in zip(
        jax.tree_util.tree_leaves(outs["plain"][0]),
        jax.tree_util.tree_leaves(outs["padded"][0]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)
