"""Solver-state-sharded step equivalence on a virtual 8-device CPU mesh.

The 2-D (data x model) formulation (parallel/sharded.py) must follow the
single-device trajectory: sharding the CG vector space / iterate grid over
the model axis and the batch over the data axis only changes WHERE values
live, never what they are (GSPMD inserts the collectives).  The rebuild-only
upgrade of the reference's single-GPU memory model (reference cg.py:152-170
keeps the full iterate grid on one device).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)
from pytorchhessianfree_tpu.models.mlp import init_mlp, mlp_apply, mse_loss
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)

SIZES = (7, 16, 16, 4)


def _problem(seed, N=32, dtype=jnp.float64):
    key = jax.random.PRNGKey(seed)
    kp, kx, ky = jax.random.split(key, 3)
    params = init_mlp(kp, sizes=SIZES, dtype=dtype)
    x = jax.random.normal(kx, (N, SIZES[0]), dtype)
    y = jax.random.normal(ky, (N, SIZES[-1]), dtype)
    return params, x, y


def _setup(curvature_opt="ggn"):
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    config = HFConfig(
        curvature_opt=curvature_opt, damping=0.5, cg_max_iter=50
    )
    return fns, config


def _assert_params_close(p_a, p_b, atol=1e-8):
    for a, b in zip(
        jax.tree_util.tree_leaves(p_a), jax.tree_util.tree_leaves(p_b)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol)


@pytest.mark.parametrize("curvature_opt", ["ggn", "hessian"])
def test_sharded_step_matches_single_device(curvature_opt):
    params, _, _ = _problem(0)
    fns, config = _setup(curvature_opt)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))  # 2 x 4

    step_single = make_hf_step(fns, config, ravel)
    step_sharded = make_sharded_hf_step(fns, config, ravel, mesh)

    p_s, p_m = params, params
    state_s = init_state(ravel, config)
    state_m = init_state(ravel, config)
    for i in range(3):
        _, x, y = _problem(i + 1)
        p_s, state_s, st_s = step_single(p_s, state_s, (x, y))
        p_m, state_m, st_m = step_sharded(p_m, state_m, (x, y))
        _assert_params_close(p_s, p_m)
        assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)
        np.testing.assert_allclose(
            float(st_s.init_loss), float(st_m.init_loss), atol=1e-10
        )
        np.testing.assert_allclose(
            float(st_s.new_damping), float(st_m.new_damping), rtol=1e-12
        )


def test_sharded_state_is_model_sharded():
    """The returned warm start must actually live sharded over the model
    axis (the memory win is real, not just a constraint annotation)."""
    params, x, y = _problem(4)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    step = make_sharded_hf_step(fns, config, ravel, mesh)
    _, state, _ = step(params, init_state(ravel, config), (x, y))

    spec = state.x0.sharding.spec
    assert tuple(spec) == ("model",)


def test_sharded_model_only_mesh():
    """data_axis=None: pure model-axis sharding (batch replicated)."""
    params, x, y = _problem(6)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("model",))

    step_single = make_hf_step(fns, config, ravel)
    step = make_sharded_hf_step(fns, config, ravel, mesh, data_axis=None)

    p_s, _, st_s = step_single(params, init_state(ravel, config), (x, y))
    p_m, _, st_m = step(params, init_state(ravel, config), (x, y))
    _assert_params_close(p_s, p_m)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)


def test_sharded_step_with_preconditioner():
    from pytorchhessianfree_tpu import diag_EF

    params, x, y = _problem(8)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    diag = diag_EF(mlp_apply, mse_loss, params, x, y, "mean", ravel)
    step_single = make_hf_step(fns, config, ravel)
    step = make_sharded_hf_step(fns, config, ravel, mesh)

    p_s, _, _ = step_single(
        params, init_state(ravel, config), (x, y), precond_diag=diag
    )
    p_m, _, _ = step(
        params, init_state(ravel, config), (x, y), precond_diag=diag
    )
    _assert_params_close(p_s, p_m)


def test_sharded_tensor_parallel_params():
    """param_specs shards the weights themselves (tensor parallelism): the
    forward partitions over the model axis, the trajectory is unchanged."""
    params, x, y = _problem(10)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    param_specs = {
        "layers": [
            {"w": P(None, "model"), "b": P("model")}
            for _ in range(len(SIZES) - 1)
        ]
    }
    step_single = make_hf_step(fns, config, ravel)
    step = make_sharded_hf_step(
        fns, config, ravel, mesh, param_specs=param_specs
    )

    p_s, p_m = params, params
    state_s = init_state(ravel, config)
    state_m = init_state(ravel, config)
    for i in range(2):
        _, x, y = _problem(20 + i)
        p_s, state_s, _ = step_single(p_s, state_s, (x, y))
        p_m, state_m, _ = step(p_m, state_m, (x, y))
        _assert_params_close(p_s, p_m)

    # the updated weights really are sharded
    w0 = p_m["layers"][0]["w"]
    assert tuple(w0.sharding.spec) == (None, "model")


def test_sharded_validation():
    params, _, _ = _problem(12)
    fns, config = _setup()
    mesh = make_mesh(8, axis_names=("data", "model"))

    with pytest.raises(ValueError, match="no axis named"):
        make_sharded_hf_step(
            fns, config, TrainableRavel(params, pad_to_multiple=8), mesh,
            model_axis="tensor",
        )
    # unpadded MLP dim is 468; 468 % 8 = 4 -> the 8-way model mesh must
    # reject it with the pad_to_multiple hint
    ravel_unpadded = TrainableRavel(params)
    mesh8 = make_mesh(8, axis_names=("model",))
    assert ravel_unpadded.dim % 8 != 0  # guard: keep the branch live
    with pytest.raises(ValueError, match="not divisible"):
        make_sharded_hf_step(
            fns, config, ravel_unpadded, mesh8, data_axis=None
        )


def test_sharded_rich_stats_and_store_dtype():
    """Sharding composes with rich stats and reduced-precision storage."""
    import dataclasses

    params, x, y = _problem(14)
    fns, _ = _setup()
    config = HFConfig(
        damping=0.5, cg_max_iter=25, rich_stats=True,
    )
    config = dataclasses.replace(
        config, cg=dataclasses.replace(config.cg, store_dtype="float32")
    )
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    step_single = make_hf_step(fns, config, ravel)
    step = make_sharded_hf_step(fns, config, ravel, mesh)

    p_s, _, st_s = step_single(params, init_state(ravel, config), (x, y))
    p_m, _, st_m = step(params, init_state(ravel, config), (x, y))
    _assert_params_close(p_s, p_m, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_s.detail.m_hist),
        np.asarray(st_m.detail.m_hist),
        atol=1e-6,
    )


def test_sharded_acc_step_matches_single_device():
    """Stacked-chunk accumulation with chunks data-sharded AND the CG space
    model-sharded must match the single-device accumulated step."""
    from pytorchhessianfree_tpu import hf_acc_step
    from pytorchhessianfree_tpu.parallel.sharded import (
        make_sharded_hf_acc_step,
    )

    params, x, y = _problem(18, N=32)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    data = (
        x.reshape(2, 16, SIZES[0]),
        y.reshape(2, 16, SIZES[-1]),
    )

    p_s, s_s, st_s = jax.jit(
        lambda p, s, d: hf_acc_step(
            p, s, fns=fns, config=config, ravel=ravel,
            loss_data=d, reduction="mean",
        )
    )(params, init_state(ravel, config), data)

    step = make_sharded_hf_acc_step(fns, config, ravel, mesh)
    p_m, s_m, st_m = step(params, init_state(ravel, config), data)

    _assert_params_close(p_s, p_m)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)
    assert tuple(s_m.x0.sharding.spec) == ("model",)
    np.testing.assert_allclose(
        float(st_s.init_loss), float(st_m.init_loss), atol=1e-10
    )


def test_sharded_train_loop_matches_single_device():
    """The scanned sharded loop follows make_hf_train_loop's trajectory and
    returns a model-sharded warm start."""
    from pytorchhessianfree_tpu import make_hf_train_loop
    from pytorchhessianfree_tpu.parallel.sharded import (
        make_sharded_hf_train_loop,
    )

    params, _, _ = _problem(16)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    T = 3
    xs, ys = [], []
    for i in range(T):
        _, x, y = _problem(30 + i)
        xs.append(x)
        ys.append(y)
    batches = (jnp.stack(xs), jnp.stack(ys))

    loop_single = make_hf_train_loop(fns, config, ravel)
    loop_sharded = make_sharded_hf_train_loop(fns, config, ravel, mesh)

    p_s, s_s, st_s = loop_single(params, init_state(ravel, config), batches)
    p_m, s_m, st_m = loop_sharded(params, init_state(ravel, config), batches)

    _assert_params_close(p_s, p_m)
    assert tuple(s_m.x0.sharding.spec) == ("model",)
    np.testing.assert_array_equal(
        np.asarray(st_s.num_cg_iters), np.asarray(st_m.num_cg_iters)
    )
    np.testing.assert_allclose(
        np.asarray(st_s.init_loss), np.asarray(st_m.init_loss), atol=1e-9
    )


def test_sharded_transformer_megatron_tp():
    """Megatron-style tensor parallelism through the second-order step: QKV
    and FF1 weights column-sharded, proj and FF2 row-sharded over the model
    axis; the HF trajectory (GGN through attention) is unchanged."""
    from pytorchhessianfree_tpu.models import cross_entropy_loss
    from pytorchhessianfree_tpu.models.transformer import (
        init_transformer,
        transformer_apply,
    )

    key = jax.random.PRNGKey(0)
    params = init_transformer(
        key, vocab=12, d_model=16, n_layers=2, d_ff=32, num_classes=4,
        max_len=8, dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, x: transformer_apply(p, x, n_heads=4),
        loss_outer=cross_entropy_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=25)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    col, row = P(None, "model"), P("model", None)
    param_specs = {
        "embed": P(None, "model"),
        "pos": P(None, "model"),
        "head": {"w": col, "b": P("model")},
        "blocks": [
            {
                "ln1": P(), "ln2": P(),
                "qkv": {"w": col, "b": P("model")},
                "proj": {"w": row, "b": P()},
                "ff1": {"w": col, "b": P("model")},
                "ff2": {"w": row, "b": P()},
            }
            for _ in range(2)
        ],
    }

    def make_batch(seed):
        k = jax.random.PRNGKey(seed)
        tokens = jax.random.randint(k, (16, 8), 0, 12)
        labels = jax.random.randint(jax.random.fold_in(k, 1), (16,), 0, 4)
        return tokens, labels

    step_single = make_hf_step(fns, config, ravel)
    step_tp = make_sharded_hf_step(
        fns, config, ravel, mesh, param_specs=param_specs
    )

    p_s, p_m = params, params
    state_s = init_state(ravel, config)
    state_m = init_state(ravel, config)
    # partitioned attention einsums reorder the reductions, and the CG
    # warm-start feedback amplifies the fp drift geometrically across
    # steps (measured ~1e-8 after step 1, ~1e-6 after step 2 in f64)
    for i, atol in enumerate((1e-7, 1e-5)):
        batch = make_batch(60 + i)
        p_s, state_s, st_s = step_single(p_s, state_s, batch)
        p_m, state_m, st_m = step_tp(p_m, state_m, batch)
        _assert_params_close(p_s, p_m, atol=atol)
        assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)

    # updated weights keep the Megatron layout
    assert tuple(p_m["blocks"][0]["qkv"]["w"].sharding.spec) == (None, "model")
    assert tuple(p_m["blocks"][0]["proj"]["w"].sharding.spec) == ("model", None)


def test_sharded_train_loop_ema_matches_single_device():
    """EMA diag-EF preconditioning through the sharded scanned loop follows
    the single-device loop's trajectory (EMA vector model-sharded)."""
    from pytorchhessianfree_tpu import make_hf_train_loop
    from pytorchhessianfree_tpu.parallel.sharded import (
        make_sharded_hf_train_loop,
    )

    params, _, _ = _problem(50)
    fns, config = _setup()
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    T = 3
    xs, ys = [], []
    for i in range(T):
        _, x, y = _problem(51 + i)
        xs.append(x)
        ys.append(y)
    batches = (jnp.stack(xs), jnp.stack(ys))

    loop_single = make_hf_train_loop(fns, config, ravel,
                                     precond_ema_decay=0.9)
    loop_sharded = make_sharded_hf_train_loop(
        fns, config, ravel, mesh, precond_ema_decay=0.9
    )
    p_s, _, st_s, ema_s = loop_single(
        params, init_state(ravel, config), batches
    )
    p_m, _, st_m, ema_m = loop_sharded(
        params, init_state(ravel, config), batches
    )
    _assert_params_close(p_s, p_m)
    # the carried EMA state agrees too (and is model-sharded)
    np.testing.assert_allclose(
        np.asarray(ema_s[0]), np.asarray(ema_m[0]), atol=1e-10
    )
    assert tuple(ema_m[0].sharding.spec) == ("model",)
    np.testing.assert_array_equal(
        np.asarray(st_s.num_cg_iters), np.asarray(st_m.num_cg_iters)
    )


@pytest.mark.parametrize("mesh_axes", ["dp", "sharded"])
def test_wrapper_mesh_matches_plain(mesh_axes):
    """HessianFree(mesh=...) -- the stateful reference-style API runs the
    DP / solver-sharded step with an unchanged trajectory."""
    from pytorchhessianfree_tpu import HessianFree

    params, _, _ = _problem(40)
    if mesh_axes == "dp":
        mesh = make_mesh(8)  # data only
    else:
        mesh = make_mesh(8, axis_names=("data", "model"))

    opt_plain = HessianFree(
        params, model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5,
        cg_max_iter=50,
    )
    opt_mesh = HessianFree(
        params, model_fn=mlp_apply, loss_outer=mse_loss, damping=0.5,
        cg_max_iter=50, mesh=mesh,
    )

    for i in range(2):
        _, x, y = _problem(41 + i)
        opt_plain.step((x, y))
        opt_mesh.step((x, y))
    _assert_params_close(opt_plain.params, opt_mesh.params)
    assert opt_plain.history["num_cg_iters"] == opt_mesh.history["num_cg_iters"]
    if mesh_axes == "sharded":
        assert tuple(opt_mesh.state.x0.sharding.spec) == ("model",)

    # preconditioner construction routes through the mesh and agrees
    _, x, y = _problem(45)
    d_plain = opt_plain.get_preconditioner(x, y, "mean")
    d_mesh = opt_mesh.get_preconditioner(x, y, "mean")
    np.testing.assert_allclose(
        np.asarray(d_plain), np.asarray(d_mesh), rtol=1e-9, atol=1e-12
    )

    # stacked acc_step through the wrapper
    _, x, y = _problem(46, N=32)
    data = (x.reshape(2, 16, SIZES[0]), y.reshape(2, 16, SIZES[-1]))
    opt_plain.acc_step(data)
    opt_mesh.acc_step(data)
    _assert_params_close(opt_plain.params, opt_mesh.params)

    # independent datalists are functional-API territory under mesh=
    with pytest.raises(ValueError, match="only loss_data"):
        opt_mesh.acc_step(data, grad_data=data)


def test_sharded_context_parallel_decoder():
    """batch_specs shards the SEQUENCE axis of the tokens over the model
    axis (context parallelism): position-wise compute partitions, GSPMD
    inserts the attention k/v all-gathers, the HF trajectory is unchanged
    from the single-device step."""
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=2, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=25)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))  # 2 x 4

    def make_batch(seed):
        tokens = jax.random.randint(jax.random.PRNGKey(seed), (4, 8), 0, 12)
        return tokens, tokens

    step_single = make_hf_step(fns, config, ravel)
    # tokens [N, T]: sequence over model (T=8 over 4), batch unsharded.
    # NOTE the gather-form embedding partitions under any SINGLE sharded
    # token axis; sharding BOTH axes trips an XLA SPMD-partitioner CHECK
    # on the curvature program's embedding-grad scatter -- the 2-D layout
    # is covered by the one-hot test below (models._embed).
    step_cp = make_sharded_hf_step(
        fns, config, ravel, mesh, batch_specs=P(None, "model")
    )

    p_s, p_m = params, params
    state_s = init_state(ravel, config)
    state_m = init_state(ravel, config)
    for i, atol in enumerate((1e-8, 1e-6)):
        batch = make_batch(70 + i)
        p_s, state_s, st_s = step_single(p_s, state_s, batch)
        p_m, state_m, st_m = step_cp(p_m, state_m, batch)
        _assert_params_close(p_s, p_m, atol=atol)
        assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)


def test_sharded_context_parallel_2d_onehot():
    """Fully 2-D batch sharding (batch over data AND sequence over model)
    via the gather-free one-hot embedding + loss (models._embed: the
    gather form's curvature scatter crashes XLA's partitioner under
    2-D-sharded tokens); trajectory unchanged."""
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    key = jax.random.PRNGKey(1)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=2, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(
            p, t, n_heads=4, embed_onehot=True
        ),
        loss_outer=lambda o, t: next_token_loss(o, t, onehot=True),
    )
    config = HFConfig(damping=1.0, cg_max_iter=25)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    tokens = jax.random.randint(jax.random.PRNGKey(75), (4, 8), 0, 12)
    batch = (tokens, tokens)

    step_single = make_hf_step(fns, config, ravel)
    step_cp = make_sharded_hf_step(
        fns, config, ravel, mesh, batch_specs=P("data", "model")
    )

    p_s, _, st_s = step_single(params, init_state(ravel, config), batch)
    p_m, _, st_m = step_cp(params, init_state(ravel, config), batch)
    _assert_params_close(p_s, p_m)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)


def test_onehot_paths_match_gather():
    """The one-hot embedding/loss forms are numerically identical to the
    gather forms (exact 0/1 selection) -- forward and gradient, f64, on
    both the decoder and the encoder classifier."""
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        init_transformer,
        next_token_loss,
        transformer_apply,
    )

    ekey = jax.random.PRNGKey(3)
    enc = init_transformer(
        ekey, vocab=12, d_model=16, n_layers=1, d_ff=32, num_classes=4,
        max_len=8, dtype=jnp.float64,
    )
    etoks = jax.random.randint(ekey, (3, 8), 0, 12)
    np.testing.assert_array_equal(
        np.asarray(transformer_apply(enc, etoks)),
        np.asarray(transformer_apply(enc, etoks, embed_onehot=True)),
    )

    key = jax.random.PRNGKey(2)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=1, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    tokens = jax.random.randint(key, (3, 8), 0, 12)

    out_g = decoder_lm_apply(params, tokens, n_heads=4)
    out_o = decoder_lm_apply(params, tokens, n_heads=4, embed_onehot=True)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_o))
    np.testing.assert_allclose(
        float(next_token_loss(out_g, tokens)),
        float(next_token_loss(out_g, tokens, onehot=True)),
        rtol=1e-15,
    )

    g_g = jax.grad(
        lambda p: next_token_loss(decoder_lm_apply(p, tokens, n_heads=4),
                                  tokens)
    )(params)
    g_o = jax.grad(
        lambda p: next_token_loss(
            decoder_lm_apply(p, tokens, n_heads=4, embed_onehot=True),
            tokens, onehot=True,
        )
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_g),
                    jax.tree_util.tree_leaves(g_o)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-14)


def test_batch_specs_tree_prefix_and_stacked():
    """_place_batch semantics: tree-prefix expansion over the batch pytree,
    a None LEAF inherits the default (DP) layout, explicit P() replicates,
    and the stacked mode prepends an unsharded leading axis to each spec."""
    from jax.sharding import NamedSharding

    from pytorchhessianfree_tpu.parallel.sharded import _place_batch

    mesh = make_mesh(8, axis_names=("data", "model"))
    x = jnp.zeros((8, 4))
    y = jnp.zeros((8,))

    # per-leaf specs; y's None leaf INHERITS the default DP layout (the
    # ADVICE-r4 footgun: customizing one leaf must not silently un-DP the
    # rest); z's explicit P() is how replication is requested
    z = jnp.zeros((8,))
    dp = NamedSharding(mesh, P("data"))
    batch = _place_batch(
        mesh, (x, y, z), (P("data", "model"), None, P()),
        default_s=dp,
    )
    assert tuple(batch[0].sharding.spec) == ("data", "model")
    assert tuple(batch[1].sharding.spec) == ("data",)
    assert batch[2].sharding.is_fully_replicated

    # direct helper call with no default: None leaf replicates
    batch = _place_batch(mesh, (x, y), (P("data", "model"), None),
                         default_s=None)
    assert batch[1].sharding.is_fully_replicated

    # one spec broadcast over the whole tree (prefix semantics)
    batch = _place_batch(mesh, (x, x), P("data"), default_s=None)
    assert tuple(batch[0].sharding.spec) == ("data",)
    assert tuple(batch[1].sharding.spec) == ("data",)

    # stacked: leading chunk/time axis prepended unsharded
    xs = jnp.zeros((3, 8, 4))
    batch = _place_batch(
        mesh, (xs,), (P("data", "model"),), default_s=None, stacked=True
    )
    assert tuple(batch[0].sharding.spec) == (None, "data", "model")


def test_sharded_acc_step_batch_specs():
    """batch_specs through the ACC step: each stacked chunk's tokens
    sharded along T over the model axis (the prepended chunk axis stays
    unsharded); trajectory == the single-device acc step."""
    from pytorchhessianfree_tpu import hf_acc_step
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )
    from pytorchhessianfree_tpu.parallel.sharded import (
        make_sharded_hf_acc_step,
    )

    key = jax.random.PRNGKey(8)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=1, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=15)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    toks = jnp.stack([
        jax.random.randint(jax.random.PRNGKey(95 + i), (4, 8), 0, 12)
        for i in range(2)
    ])  # [C=2, N=4, T=8]
    loss_data = (toks, toks)

    import functools

    single = jax.jit(functools.partial(
        hf_acc_step, fns=fns, config=config, ravel=ravel,
        loss_data=loss_data, reduction="mean",
    ))
    step_cp = make_sharded_hf_acc_step(
        fns, config, ravel, mesh, reduction="mean",
        batch_specs=P(None, "model"),
    )
    p_s, _, st_s = single(params, init_state(ravel, config))
    p_m, _, st_m = step_cp(params, init_state(ravel, config), loss_data)
    _assert_params_close(p_s, p_m, atol=1e-8)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)


def test_wrapper_batch_specs_context_parallel():
    """HessianFree(mesh=, batch_specs=): the stateful wrapper runs the
    context-parallel layout with an unchanged trajectory, and rejects
    batch_specs without a mesh."""
    from pytorchhessianfree_tpu import HessianFree
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    key = jax.random.PRNGKey(6)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=2, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(90), (4, 8), 0, 12)
    mesh = make_mesh(8, axis_names=("data", "model"))
    kw = dict(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
        damping=1.0, cg_max_iter=20,
    )

    opt_plain = HessianFree(params, **kw)
    opt_cp = HessianFree(
        params, mesh=mesh, batch_specs=P(None, "model"), **kw
    )
    for i in range(2):
        t = jax.random.randint(jax.random.PRNGKey(91 + i), (4, 8), 0, 12)
        opt_plain.step((t, t))
        opt_cp.step((t, t))
    _assert_params_close(opt_plain.params, opt_cp.params, atol=1e-7)
    assert (opt_plain.history["num_cg_iters"]
            == opt_cp.history["num_cg_iters"])

    with pytest.raises(ValueError, match="batch_specs require"):
        HessianFree(params, batch_specs=P(None, "model"), **kw)
    with pytest.raises(ValueError, match="batch_specs require"):
        HessianFree(
            params, mesh=make_mesh(8), batch_specs=P(None, "model"), **kw
        )


def test_sharded_train_loop_context_parallel():
    """batch_specs through the scanned loop: per-step tokens T-sharded
    (the time axis prepended unsharded), trajectory unchanged."""
    from pytorchhessianfree_tpu import make_hf_train_loop
    from pytorchhessianfree_tpu.parallel.sharded import (
        make_sharded_hf_train_loop,
    )
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    key = jax.random.PRNGKey(3)
    params = init_decoder_lm(
        key, vocab=12, d_model=16, n_layers=1, d_ff=32, max_len=8,
        dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=4),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=15)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    toks = jnp.stack([
        jax.random.randint(jax.random.PRNGKey(80 + i), (4, 8), 0, 12)
        for i in range(2)
    ])
    batches = (toks, toks)

    loop_single = make_hf_train_loop(fns, config, ravel)
    loop_cp = make_sharded_hf_train_loop(
        fns, config, ravel, mesh, batch_specs=P(None, "model")
    )
    p_s, _, st_s = loop_single(params, init_state(ravel, config), batches)
    p_m, _, st_m = loop_cp(params, init_state(ravel, config), batches)
    _assert_params_close(p_s, p_m, atol=1e-7)
    np.testing.assert_array_equal(
        np.asarray(st_s.num_cg_iters), np.asarray(st_m.num_cg_iters)
    )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))
