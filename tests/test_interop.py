"""Interop + precision-option tests.

- Flax modules work out of the box (their params ARE pytrees) -- the
  "switching user" story: bring any pytree model to the optimizer.
- The bf16 curvature option keeps the step functional and close to the f32
  trajectory (the matvec is the only reduced-precision piece).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import HessianFree, HFConfig
from pytorchhessianfree_tpu.models import init_mlp, mlp_apply, mse_loss


def test_flax_module_interop():
    flax = pytest.importorskip("flax")
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(8)(x)
            x = nn.tanh(x)
            return nn.Dense(3)(x)

    key = jax.random.PRNGKey(0)
    net = Net()
    x = jax.random.normal(key, (16, 7), jnp.float32)
    y = jax.random.normal(key, (16, 3), jnp.float32)
    variables = net.init(key, x)

    opt = HessianFree(
        variables,
        model_fn=lambda v, inputs: net.apply(v, inputs),
        loss_outer=mse_loss,
        damping=0.5,
        cg_max_iter=30,
    )
    l0 = None
    for _ in range(3):
        opt.step((x, y))
    assert (
        opt.history["final_losses"][-1] < opt.history["init_losses"][0]
    ), "flax model failed to train"


def test_bf16_curvature_close_to_f32():
    key = jax.random.PRNGKey(0)
    params = init_mlp(key, dtype=jnp.float32)
    x = jax.random.normal(key, (16, 7), jnp.float32)
    y = jax.random.normal(key, (16, 3), jnp.float32)

    def run(curv_dtype):
        opt = HessianFree(
            params,
            model_fn=mlp_apply,
            loss_outer=mse_loss,
            config=HFConfig(
                damping=0.5, cg_max_iter=20, curvature_dtype=curv_dtype
            ),
        )
        for _ in range(2):
            opt.step((x, y))
        return opt.history["final_losses"][-1]

    f32 = run(None)
    bf16 = run("bfloat16")
    # bf16 matvecs perturb the CG trajectory but must still optimize to a
    # comparable loss on this well-conditioned toy problem
    assert np.isfinite(bf16)
    np.testing.assert_allclose(bf16, f32, rtol=0.25)


@pytest.mark.parametrize("curvature_opt", ["ggn", "hessian"])
def test_bf16_matvec_approximates_f32(curvature_opt):
    from pytorchhessianfree_tpu import HFModelFns, TrainableRavel
    from pytorchhessianfree_tpu.optimizer import _build_matvec_and_grad

    key = jax.random.PRNGKey(1)
    params = init_mlp(key, dtype=jnp.float32)
    x = jax.random.normal(key, (8, 7), jnp.float32)
    y = jax.random.normal(key, (8, 3), jnp.float32)
    fns = HFModelFns(model_fn=mlp_apply, loss_outer=mse_loss)
    ravel = TrainableRavel(params)

    cfg32 = HFConfig(curvature_opt=curvature_opt, damping=0.5)
    cfgbf = HFConfig(
        curvature_opt=curvature_opt, damping=0.5, curvature_dtype="bfloat16"
    )
    loss32, grad32, mvp32 = _build_matvec_and_grad(
        fns, cfg32, ravel, params, (x, y)
    )
    lossbf, gradbf, mvpbf = _build_matvec_and_grad(
        fns, cfgbf, ravel, params, (x, y)
    )

    # loss and gradient are full precision in BOTH configs
    np.testing.assert_allclose(float(loss32), float(lossbf), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad32), np.asarray(gradbf), rtol=1e-6, atol=1e-7
    )

    v = jax.random.normal(key, (ravel.dim,), jnp.float32)
    a, b = np.asarray(mvp32(v)), np.asarray(mvpbf(v))
    assert b.dtype == np.float32  # CG vector space stays f32
    # bf16 has ~3 decimal digits; direction must agree strongly
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.99


# ---------------------------------------------------------------------------
# interop adapters: flax state/rng collections + dm-haiku transforms
# ---------------------------------------------------------------------------

from pytorchhessianfree_tpu import (  # noqa: E402
    HFModelFns,
    TrainableRavel,
    flax_fns,
    flax_state_update,
    haiku_fns,
    haiku_state_update,
    init_state,
    make_hf_step,
    split_flax_variables,
)
from pytorchhessianfree_tpu.optimizer import check_deterministic  # noqa: E402


def _toy_xy(key, n=16, d_in=7, d_out=3):
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (n, d_in), jnp.float32)
    y = jax.random.normal(ky, (n, d_out), jnp.float32)
    return x, y


def _run_steps(fns, params, batch, n_steps=3, cg_max_iter=20):
    config = HFConfig(damping=0.5, cg_max_iter=cg_max_iter)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    losses = []
    for _ in range(n_steps):
        params, state, stats = step(params, state, batch)
        losses.append(float(stats.final_loss))
    return params, losses, float(stats.init_loss)


def _bn_net():
    pytest.importorskip("flax")
    import flax.linen as nn

    class BNNet(nn.Module):
        @nn.compact
        def __call__(self, x, train: bool = False):
            x = nn.Dense(8)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.tanh(x)
            return nn.Dense(3)(x)

    return BNNet()


def test_flax_fns_batchnorm_state_frozen():
    net = _bn_net()
    key = jax.random.PRNGKey(0)
    x, y = _toy_xy(key)
    variables = net.init(jax.random.fold_in(key, 1), x, train=True)
    params, bn_state = split_flax_variables(variables)
    assert "batch_stats" in bn_state

    fns = flax_fns(net, mse_loss, state=bn_state)
    # frozen state => fully deterministic forwards
    o1 = fns.model_fn(params, x)
    o2 = fns.model_fn(params, x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    _, losses, init_loss = _run_steps(fns, params, (x, y))
    assert losses[-1] < init_loss, "flax BatchNorm model failed to train"


def test_flax_fns_train_mode_mutation_raises():
    # a module that tries to MUTATE batch_stats inside the (immutable)
    # adapter apply must fail loudly, not silently drop the update
    net = _bn_net()
    key = jax.random.PRNGKey(0)
    x, _ = _toy_xy(key)
    variables = net.init(jax.random.fold_in(key, 1), x, train=True)
    params, bn_state = split_flax_variables(variables)
    fns = flax_fns(
        net, mse_loss, state=bn_state, apply_kwargs={"train": True}
    )
    with pytest.raises(Exception, match="[Cc]ollection.*immutable|mutable"):
        fns.model_fn(params, x)


def test_flax_state_update_refreshes_batch_stats():
    net = _bn_net()
    key = jax.random.PRNGKey(2)
    x, _ = _toy_xy(key)
    variables = net.init(jax.random.fold_in(key, 1), x, train=True)
    params, bn_state = split_flax_variables(variables)

    new_state = flax_state_update(
        net, params, bn_state, x, apply_kwargs={"train": True}
    )
    assert set(new_state.keys()) == set(bn_state.keys())
    old_mean = jax.tree_util.tree_leaves(bn_state["batch_stats"])[0]
    new_mean = jax.tree_util.tree_leaves(new_state["batch_stats"])[0]
    assert not np.allclose(np.asarray(old_mean), np.asarray(new_mean))


def test_flax_fns_dropout_key_in_batch():
    pytest.importorskip("flax")
    import flax.linen as nn

    class DropNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(16)(x)
            x = nn.Dropout(rate=0.2, deterministic=False)(x)
            x = nn.tanh(x)
            return nn.Dense(3)(x)

    net = DropNet()
    key = jax.random.PRNGKey(3)
    x, y = _toy_xy(key)
    variables = net.init(
        {"params": key, "dropout": jax.random.fold_in(key, 1)}, x
    )
    params, _ = split_flax_variables(variables)

    fns = flax_fns(net, mse_loss, rngs=("dropout",))
    dk = jax.random.fold_in(key, 7)
    batch = ((x, dk), y)

    # same batch key => identical masks => deterministic inside the step
    o1 = fns.model_fn(params, (x, dk))
    o2 = fns.model_fn(params, (x, dk))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    config = HFConfig(damping=0.5, cg_max_iter=20)
    ravel = TrainableRavel(params)
    res = check_deterministic(fns, config, ravel, params, batch)
    assert res["forward_deterministic"] and res["mvp_deterministic"]

    # the ANTI-pattern: a model drawing its key per-construction instead of
    # from the batch is exactly what the factory check flags
    def rethreaded(k):
        def model_fn(p, inputs):
            return net.apply({"params": p}, inputs, rngs={"dropout": k})

        return HFModelFns(model_fn=model_fn, loss_outer=mse_loss)

    res = check_deterministic(
        rethreaded(dk), config, ravel, params, (x, y),
        fns_factory=rethreaded,
    )
    assert res["rng_invariant"] is False

    # trains under full HF with the key advanced between steps
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    first, last = None, None
    for i in range(3):
        batch = ((x, jax.random.fold_in(dk, i)), y)
        params, state, stats = step(params, state, batch)
        first = float(stats.init_loss) if first is None else first
        last = float(stats.final_loss)
    assert last < first, "flax dropout model failed to train"


def test_haiku_fns_mlp_trains():
    hk = pytest.importorskip("haiku")

    def fwd(x):
        x = hk.Linear(8)(x)
        x = jnp.tanh(x)
        return hk.Linear(3)(x)

    t = hk.transform(fwd)
    key = jax.random.PRNGKey(4)
    x, y = _toy_xy(key)
    params = t.init(key, x)

    fns = haiku_fns(t, mse_loss)
    _, losses, init_loss = _run_steps(fns, params, (x, y))
    assert losses[-1] < init_loss, "haiku model failed to train"


def test_haiku_fns_rng_in_batch_dropout():
    hk = pytest.importorskip("haiku")

    def fwd(x):
        x = hk.Linear(16)(x)
        x = hk.dropout(hk.next_rng_key(), 0.2, x)
        x = jnp.tanh(x)
        return hk.Linear(3)(x)

    t = hk.transform(fwd)
    key = jax.random.PRNGKey(5)
    x, y = _toy_xy(key)
    params = t.init(key, x)

    fns = haiku_fns(t, mse_loss, rng_in_batch=True)
    dk = jax.random.fold_in(key, 9)
    o1 = fns.model_fn(params, (x, dk))
    o2 = fns.model_fn(params, (x, dk))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    _, losses, init_loss = _run_steps(fns, params, ((x, dk), y))
    assert losses[-1] < init_loss


def test_haiku_fns_with_state_frozen():
    hk = pytest.importorskip("haiku")

    def fwd(x, is_training: bool = False):
        x = hk.Linear(8)(x)
        x = hk.BatchNorm(
            create_scale=True, create_offset=True, decay_rate=0.9
        )(x, is_training=is_training)
        x = jnp.tanh(x)
        return hk.Linear(3)(x)

    t = hk.transform_with_state(fwd)
    key = jax.random.PRNGKey(6)
    x, y = _toy_xy(key)
    params, bn_state = t.init(key, x, is_training=True)

    fns = haiku_fns(t, mse_loss, state=bn_state)
    o1 = fns.model_fn(params, x)
    o2 = fns.model_fn(params, x)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    _, losses, init_loss = _run_steps(fns, params, (x, y))
    assert losses[-1] < init_loss, "haiku BatchNorm model failed to train"

    new_state = haiku_state_update(
        t, params, bn_state, x, apply_kwargs={"is_training": True}
    )
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree_util.tree_leaves(bn_state),
            jax.tree_util.tree_leaves(new_state),
        )
    )
    assert changed, "state update did not refresh the running statistics"


def test_flax_fns_state_in_batch_no_recompile():
    # state-as-batch-data: refreshing BatchNorm stats between steps must
    # REUSE the compiled step program (a state closure would retrace)
    net = _bn_net()
    key = jax.random.PRNGKey(8)
    x, y = _toy_xy(key)
    variables = net.init(jax.random.fold_in(key, 1), x, train=True)
    params, bn_state = split_flax_variables(variables)

    base = flax_fns(net, mse_loss, state_in_batch=True)
    trace_calls = []

    def counting_model_fn(p, inputs):
        trace_calls.append(1)  # Python only runs while TRACING
        return base.model_fn(p, inputs)

    fns = base._replace(model_fn=counting_model_fn)
    config = HFConfig(damping=0.5, cg_max_iter=20)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)

    params, state, s1 = step(params, state, ((x, bn_state), y))
    n_traced = len(trace_calls)
    assert n_traced > 0

    bn_state = flax_state_update(
        net, params, bn_state, x, apply_kwargs={"train": True}
    )
    params, state, s2 = step(params, state, ((x, bn_state), y))
    assert len(trace_calls) == n_traced, "state refresh retraced the step"
    assert float(s2.final_loss) < float(s1.init_loss)


def test_haiku_fns_state_in_batch():
    hk = pytest.importorskip("haiku")

    def fwd(x, is_training: bool = False):
        x = hk.Linear(8)(x)
        x = hk.BatchNorm(
            create_scale=True, create_offset=True, decay_rate=0.9
        )(x, is_training=is_training)
        x = jnp.tanh(x)
        return hk.Linear(3)(x)

    t = hk.transform_with_state(fwd)
    key = jax.random.PRNGKey(9)
    x, y = _toy_xy(key)
    params, bn_state = t.init(key, x, is_training=True)

    fns = haiku_fns(t, mse_loss, state_in_batch=True)
    o1 = fns.model_fn(params, (x, bn_state))
    o2 = fns.model_fn(params, (x, bn_state))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    _, losses, init_loss = _run_steps(fns, params, ((x, bn_state), y))
    assert losses[-1] < init_loss


def test_huggingface_flax_gpt2_trains_under_hf():
    """Ecosystem interop: a real HuggingFace transformers model
    (FlaxGPT2LMHeadModel built from config -- no weights download) trains
    under the full Hessian-free step through the plain model_fn contract.
    The reference's analog claim is 'any torch.nn.Module'; ours is 'any
    callable params -> outputs', which HF flax models satisfy directly
    (dropout off via train=False, the reference's own recommendation for
    stochastic models, reference optimizer.py:406-409)."""
    transformers = pytest.importorskip("transformers")
    import warnings

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        init_state,
        make_hf_step,
    )
    from pytorchhessianfree_tpu.models import next_token_loss

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        from transformers.models.gpt2.modeling_flax_gpt2 import (
            FlaxGPT2LMHeadModel,
        )

        cfg = transformers.GPT2Config(
            vocab_size=32, n_positions=8, n_embd=16, n_layer=2, n_head=2,
            resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0,
        )
        model = FlaxGPT2LMHeadModel(cfg, seed=0, dtype=jnp.float32)

    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32), model.params
    )

    def model_fn(p, toks):
        return model(toks, params=p, train=False).logits

    fns = HFModelFns(model_fn=model_fn, loss_outer=next_token_loss)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    config = HFConfig(damping=1.0, cg_max_iter=15)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)

    # affine next-token rule over the 32-vocab (fully learnable)
    start = jax.random.randint(jax.random.PRNGKey(3), (4,), 0, 32)
    toks = [start]
    for _ in range(7):
        toks.append((5 * toks[-1] + 3) % 32)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)

    losses = []
    for _ in range(3):
        params, state, stats = step(params, state, (tokens, tokens))
        assert bool(jnp.isfinite(stats.final_loss))
        losses.append(float(stats.final_loss))
    assert losses[-1] < losses[0]
