"""Checkpoint/resume round-trips (SURVEY.md aux subsystem: checkpointing).

The restored (params, HFState, history) must continue training identically --
the pytree-state analog of the reference's inherited
``torch.optim.Optimizer.state_dict()`` round-trip
(reference examples/run_small_nn.py:46-52)."""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.checkpoint import (
    restore,
    restore_npz,
    save,
    save_npz,
)
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply, mse_loss


def _setup():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=30)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    x = jax.random.normal(key, (16, 7), jnp.float64)
    y = jax.random.normal(key, (16, 3), jnp.float64)
    return params, config, ravel, step, (x, y)


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_checkpoint_roundtrip_continues_identically(backend):
    params, config, ravel, step, batch = _setup()
    state = init_state(ravel, config)

    # two steps, checkpoint, two more
    for _ in range(2):
        params, state, _ = step(params, state, batch)

    with tempfile.TemporaryDirectory() as d:
        hist = {"init_losses": [1.0, 0.5]}
        if backend == "npz":
            path = os.path.join(d, "ckpt.npz")
            save_npz(path, params, state, hist)
            r_params, r_state, r_hist = restore_npz(path, params)
        else:
            path = os.path.join(d, "ckpt")
            save(path, params, state, hist)
            r_params, r_state, r_hist = restore(path)

    assert r_hist["init_losses"] == [1.0, 0.5]
    assert int(r_state.step_count) == 2
    np.testing.assert_array_equal(
        np.asarray(r_state.x0), np.asarray(state.x0)
    )

    # Continuation must be bit-identical.
    p1, s1, stats1 = step(params, state, batch)
    p2, s2, stats2 = step(r_params, r_state, batch)
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(stats1.final_loss) == float(stats2.final_loss)


def test_restore_warns_on_missing_history(tmp_path):
    """save() always writes history.json (atomically); a tree without one
    means the save was torn -- restore surfaces a warning instead of
    silently returning empty history."""
    import warnings

    params, config, ravel, step, batch = _setup()
    state = init_state(ravel, config)
    path = os.path.join(str(tmp_path), "ckpt")
    save(path, params, state, {"init_losses": [1.0]})
    assert os.path.exists(os.path.join(path, "history.json"))
    assert not os.path.exists(
        os.path.join(path, "history.json.tmp")
    )  # atomic write left no temp file
    os.remove(os.path.join(path, "history.json"))  # simulate torn save
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        _, _, hist = restore(path)
    assert hist == {}
    assert any("interrupted save" in str(x.message) for x in w)


def test_npz_leaf_count_mismatch():
    params, config, ravel, step, batch = _setup()
    state = init_state(ravel, config)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_npz(path, params, state)
        bad_template = {"only": jnp.zeros(3)}
        with pytest.raises(ValueError):
            restore_npz(path, bad_template)


@pytest.mark.parametrize("backend", ["npz", "orbax"])
def test_checkpoint_roundtrip_sharded_state(backend, tmp_path):
    """A model-axis-sharded HFState checkpoints and resumes identically on
    the mesh (the restored warm start is re-placed by the sharded step)."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 (virtual) devices")
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    key = jax.random.PRNGKey(5)
    params = init_mlp(key, sizes=(7, 16, 16, 4), dtype=jnp.float64)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(damping=0.5, cg_max_iter=30)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))
    step = make_sharded_hf_step(fns, config, ravel, mesh)

    kx, ky = jax.random.split(key)
    b1 = (
        jax.random.normal(kx, (16, 7), jnp.float64),
        jax.random.normal(ky, (16, 4), jnp.float64),
    )
    b2 = (
        jax.random.normal(ky, (16, 7), jnp.float64),
        jax.random.normal(kx, (16, 4), jnp.float64),
    )

    p1, s1, _ = step(params, init_state(ravel, config), b1)
    assert tuple(s1.x0.sharding.spec) == ("model",)

    path = str(tmp_path / "ckpt")
    if backend == "npz":
        save_npz(path + ".npz", p1, s1)
        p_r, s_r, _ = restore_npz(path + ".npz", params)
    else:
        save(path, p1, s1)
        p_r, s_r, _ = restore(path)

    # uninterrupted vs resumed second step
    p2, s2, st2 = step(p1, s1, b2)
    p2_r, s2_r, st2_r = step(p_r, s_r, b2)
    for a, b in zip(
        jax.tree_util.tree_leaves(p2), jax.tree_util.tree_leaves(p2_r)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(st2.num_cg_iters) == int(st2_r.num_cg_iters)


def test_npz_path_normalization(tmp_path):
    """save_npz('ckpt') / restore_npz('ckpt') agree on the same file (numpy
    appends .npz on save; restore used to pass the bare path to np.load)."""
    params, config, ravel, step, batch = _setup()
    from pytorchhessianfree_tpu import init_state as _init

    state = _init(ravel, config)
    base = str(tmp_path / "ckpt")  # no extension
    save_npz(base, params, state)
    p, s, _ = restore_npz(base, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_rejects_wrong_template(tmp_path):
    """A template with mismatched structure or shapes fails loudly at
    restore time, not later with a cryptic shape error."""
    params, config, ravel, step, batch = _setup()
    from pytorchhessianfree_tpu import init_state as _init

    state = _init(ravel, config)
    path = str(tmp_path / "c.npz")
    save_npz(path, params, state)

    # same leaf count, different structure
    leaves = jax.tree_util.tree_leaves(params)
    bad_structure = {f"k{i}": l for i, l in enumerate(leaves)}
    with pytest.raises(ValueError, match="structure"):
        restore_npz(path, bad_structure)

    # same structure, different shapes
    bad_shapes = jax.tree_util.tree_map(
        lambda a: jnp.zeros(a.shape + (1,), a.dtype), params
    )
    with pytest.raises(ValueError, match="shape"):
        restore_npz(path, bad_shapes)
