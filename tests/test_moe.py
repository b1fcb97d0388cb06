"""Mixture-of-Experts decoder: routing oracle, layout parities, HF training,
expert parallelism.

The reference has no sparse-expert model (its zoo is MLPs/CNNs); these
tests pin the GShard-style einsum dispatch (models/moe.py) against an
independent per-token NumPy replica and prove the HF pipeline trains the
model unchanged -- routing is deterministic and piecewise-constant, so
CG's fixed-quadratic assumption holds.
"""

import math

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
from pytorchhessianfree_tpu.models import (
    init_moe_decoder_lm,
    moe_decoder_lm_apply,
    moe_param_specs,
    next_token_loss,
)
from pytorchhessianfree_tpu.models.moe import _moe_ffn


def _softmax(x):
    e = np.exp(x - x.max(axis=-1, keepdims=True))
    return e / e.sum(axis=-1, keepdims=True)


def _moe_ffn_oracle(blk, h, capacity_factor, top_k=2):
    """Per-token NumPy replica of the einsum dispatch: top-k routing,
    arrival-order slots (ALL first choices claim slots before any second
    choice), per-expert capacity, renormalized gates for k=2 / the raw
    router probability for k=1 (Switch), dropped choices lost (not
    redistributed)."""
    N, T, d = h.shape
    E = blk["gate"].shape[-1]
    G = N * T
    C = int(math.ceil(capacity_factor * top_k * G / E))
    hf = np.asarray(h, np.float64).reshape(G, d)
    probs = _softmax(hf @ np.asarray(blk["gate"], np.float64))

    choice1 = probs.argmax(axis=1)
    probs_wo1 = probs.copy()
    probs_wo1[np.arange(G), choice1] = 0.0
    choice2 = probs_wo1.argmax(axis=1)

    count1_total = np.zeros(E, int)  # ALL first-choice claims
    kept = []  # (g, e, gate)
    seen1 = np.zeros(E, int)
    for g in range(G):
        e = choice1[g]
        g1, g2 = probs[g, choice1[g]], probs[g, choice2[g]]
        z = (g1 + g2 if (g1 + g2) > 0 else 1.0) if top_k == 2 else 1.0
        if seen1[e] < C:
            kept.append((g, e, g1 / z))
        seen1[e] += 1
        count1_total[e] += 1
    if top_k == 2:
        seen2 = count1_total.copy()  # second choices after ALL first claims
        for g in range(G):
            e = choice2[g]
            g1, g2 = probs[g, choice1[g]], probs[g, choice2[g]]
            z = g1 + g2 if (g1 + g2) > 0 else 1.0
            if seen2[e] < C:
                kept.append((g, e, g2 / z))
            seen2[e] += 1

    def gelu(x):
        return np.asarray(jax.nn.gelu(jnp.asarray(x)))

    out = np.zeros_like(hf)
    w1 = np.asarray(blk["w1"], np.float64)
    b1 = np.asarray(blk["b1"], np.float64)
    w2 = np.asarray(blk["w2"], np.float64)
    b2 = np.asarray(blk["b2"], np.float64)
    for g, e, gate in kept:
        y = gelu(hf[g] @ w1[e] + b1[e]) @ w2[e] + b2[e]
        out[g] += gate * y
    return out.reshape(N, T, d)


def _make_block(key, d, d_ff, E, dtype=jnp.float64):
    p = init_moe_decoder_lm(
        key, vocab=8, d_model=d, n_layers=1, d_ff=d_ff, n_experts=E,
        max_len=4, dtype=dtype,
    )
    return p["blocks"][0]


@pytest.mark.parametrize("capacity_factor", [1.25, 0.4])
def test_moe_ffn_matches_per_token_oracle(capacity_factor):
    """The einsum dispatch must equal the independent per-token replica --
    including at capacity_factor=0.4, where experts overflow and tokens
    drop (the crowded regime)."""
    key = jax.random.PRNGKey(0)
    blk = _make_block(key, d=8, d_ff=16, E=4)
    h = jax.random.normal(jax.random.fold_in(key, 1), (3, 4, 8),
                          jnp.float64)
    out, aux = _moe_ffn(blk, h, capacity_factor)
    ref = _moe_ffn_oracle(blk, h, capacity_factor)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)
    assert float(aux) > 0.0


def test_moe_crowded_expert_drops_tokens():
    """Bias the gate so every token's first choice is expert 0: beyond
    capacity the first choice is dropped, and the oracle must still agree
    (second choices start AFTER all first-choice claims)."""
    key = jax.random.PRNGKey(1)
    blk = _make_block(key, d=8, d_ff=16, E=4)
    blk = dict(blk)
    gate = np.asarray(blk["gate"], np.float64).copy()
    gate[:, 0] = gate[:, 0] + 50.0  # expert 0 dominates every token
    blk["gate"] = jnp.asarray(gate)
    h = jax.random.normal(jax.random.fold_in(key, 2), (2, 4, 8),
                          jnp.float64)
    out, _ = _moe_ffn(blk, h, 0.4)  # capacity = ceil(.4*2*8/4) = 2 slots
    ref = _moe_ffn_oracle(blk, h, 0.4)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)
    # some tokens really did lose their first choice
    assert np.any(np.abs(ref) > 0)


def test_moe_router_groups_matches_per_group_oracle():
    """router_groups=S partitions the flattened tokens into S groups with
    per-group capacity: each group must independently equal the oracle run
    on that group's tokens alone, and differ from the global routing when
    an expert is crowded."""
    key = jax.random.PRNGKey(21)
    blk = _make_block(key, d=8, d_ff=16, E=4)
    h = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8),
                          jnp.float64)  # G = 16 tokens
    out, aux = _moe_ffn(blk, h, 0.5, router_groups=2)
    hf = np.asarray(h, np.float64).reshape(16, 8)
    refs = []
    for s in range(2):
        grp = jnp.asarray(hf[s * 8:(s + 1) * 8].reshape(1, 8, 8))
        refs.append(_moe_ffn_oracle(blk, grp, 0.5).reshape(8, 8))
    ref = np.concatenate(refs, axis=0).reshape(2, 8, 8)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)
    assert float(aux) > 0.0

    with pytest.raises(ValueError, match="must divide the token count"):
        _moe_ffn(blk, h, 0.5, router_groups=3)


def test_moe_top1_switch_matches_oracle_and_trains():
    """top_k=1 (Switch routing): single expert per token, gate = the raw
    router probability, capacity cf*G/E -- oracle parity at a crowding
    capacity factor, and a full HF step decreases the loss."""
    key = jax.random.PRNGKey(31)
    blk = _make_block(key, d=8, d_ff=16, E=4)
    h = jax.random.normal(jax.random.fold_in(key, 1), (3, 4, 8),
                          jnp.float64)
    out, aux = _moe_ffn(blk, h, 0.6, top_k=1)
    ref = _moe_ffn_oracle(blk, h, 0.6, top_k=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-11, atol=1e-12)
    assert float(aux) > 0.0

    params = init_moe_decoder_lm(
        key, vocab=16, d_model=16, n_layers=1, d_ff=32, n_experts=4,
        max_len=8, dtype=jnp.float64,
    )
    tokens = jax.random.randint(key, (4, 8), 0, 16)
    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t, top_k=1),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=10)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    p, s, stats = step(params, init_state(ravel, config),
                       (tokens, tokens))
    assert float(stats.final_loss) < float(stats.init_loss)

    with pytest.raises(ValueError, match="top_k must be"):
        _moe_ffn(blk, h, 1.0, top_k=3)


def test_moe_rejects_single_expert():
    key = jax.random.PRNGKey(9)
    params = init_moe_decoder_lm(
        key, vocab=8, d_model=8, n_layers=1, d_ff=16, n_experts=1,
        max_len=4,
    )
    toks = jax.random.randint(key, (2, 4), 0, 8)
    with pytest.raises(ValueError, match=">= 2 experts"):
        moe_decoder_lm_apply(params, toks, n_heads=2)


def test_moe_scan_matches_unrolled_and_knobs_compose():
    key = jax.random.PRNGKey(2)
    params = init_moe_decoder_lm(
        key, vocab=16, d_model=16, n_layers=2, d_ff=32, n_experts=4,
        max_len=8, dtype=jnp.float64,
    )
    toks = jax.random.randint(key, (3, 8), 0, 16)
    base = moe_decoder_lm_apply(params, toks)
    for kw in (
        {"scan_layers": False},
        {"remat": True},
        {"attn_chunk": 4},
        {"scan_layers": False, "remat": True, "attn_chunk": 2},
        {"embed_onehot": True},
    ):
        other = moe_decoder_lm_apply(params, toks, **kw)
        np.testing.assert_allclose(
            np.asarray(base), np.asarray(other), rtol=1e-11, atol=1e-13,
            err_msg=str(kw),
        )


def test_moe_hf_trains():
    """Full HF steps on the affine next-token task: loss decreases and CG
    reports a clean termination (routing's piecewise-constant masks do
    not break the quadratic model)."""
    key = jax.random.PRNGKey(3)
    params = init_moe_decoder_lm(
        key, vocab=16, d_model=16, n_layers=2, d_ff=32, n_experts=4,
        max_len=8, dtype=jnp.float64,
    )
    start = jax.random.randint(key, (8,), 0, 16)
    toks = [start]
    for _ in range(7):
        toks.append((5 * toks[-1] + 3) % 16)
    tokens = jnp.stack(toks, axis=1).astype(jnp.int32)

    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=20)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    first = last = None
    p = params
    for _ in range(5):
        p, state, stats = step(p, state, (tokens, tokens))
        first = float(stats.init_loss) if first is None else first
        last = float(stats.final_loss)
    assert last < 0.5 * first


def test_moe_aux_loss_through_hf():
    """The Switch load-balance aux folds into the HF loss through
    ``return_aux=True`` (the GGN treats it as one more output block)."""
    key = jax.random.PRNGKey(4)
    params = init_moe_decoder_lm(
        key, vocab=16, d_model=16, n_layers=1, d_ff=32, n_experts=4,
        max_len=8, dtype=jnp.float64,
    )
    tokens = jax.random.randint(key, (4, 8), 0, 16)

    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t, return_aux=True),
        loss_outer=lambda out, t: next_token_loss(out[0], t)
        + 0.01 * out[1],
    )
    config = HFConfig(damping=1.0, cg_max_iter=10)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    p, s, stats = step(params, init_state(ravel, config),
                       (tokens, tokens))
    assert bool(jnp.isfinite(stats.final_loss))
    assert float(stats.final_loss) < float(stats.init_loss)


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)
def test_moe_expert_parallel_matches_single_device():
    """Expert parallelism as a sharding annotation: moe_param_specs shards
    the expert axis of w1/w2 over the model mesh axis; the HF trajectory
    matches the single-device step and the updated experts keep the EP
    layout."""
    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    key = jax.random.PRNGKey(5)
    n_layers = 2
    params = init_moe_decoder_lm(
        key, vocab=12, d_model=16, n_layers=n_layers, d_ff=32,
        n_experts=4, max_len=8, dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=20)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    tokens = jax.random.randint(jax.random.PRNGKey(50), (4, 8), 0, 12)
    batch = (tokens, tokens)

    step_single = make_hf_step(fns, config, ravel)
    step_ep = make_sharded_hf_step(
        fns, config, ravel, mesh, param_specs=moe_param_specs(n_layers)
    )

    p_s, _, st_s = step_single(params, init_state(ravel, config), batch)
    p_m, _, st_m = step_ep(params, init_state(ravel, config), batch)
    # the partitioned dispatch einsums reorder many small reductions and
    # 20 CG iterations amplify the drift (measured ~1.6e-7 after 1 step
    # in f64, same class as the Megatron-TP test's documented growth)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)
    assert tuple(p_m["blocks"][0]["w1"].sharding.spec) == (
        "model", None, None,
    )


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)
def test_moe_expert_parallel_composes_with_context_parallel():
    """EP x CP on ONE mesh axis: expert weights sharded over `model`
    (moe_param_specs) while the tokens shard along the SEQUENCE axis over
    the same axis (batch_specs) -- the dispatch einsums then mix an
    e-sharded operand with T-sharded tokens and GSPMD must resolve both.
    Trajectory == the single-device step."""
    from jax.sharding import PartitionSpec as P

    from pytorchhessianfree_tpu.parallel.mesh import make_mesh
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    key = jax.random.PRNGKey(6)
    n_layers = 2
    params = init_moe_decoder_lm(
        key, vocab=12, d_model=16, n_layers=n_layers, d_ff=32,
        n_experts=4, max_len=8, dtype=jnp.float64,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=15)
    ravel = TrainableRavel(params, pad_to_multiple=8)
    mesh = make_mesh(8, axis_names=("data", "model"))

    tokens = jax.random.randint(jax.random.PRNGKey(51), (4, 8), 0, 12)
    batch = (tokens, tokens)

    step_single = make_hf_step(fns, config, ravel)
    step_epcp = make_sharded_hf_step(
        fns, config, ravel, mesh,
        param_specs=moe_param_specs(n_layers),
        batch_specs=P(None, "model"),  # sequence axis over the model axis
    )

    p_s, _, st_s = step_single(params, init_state(ravel, config), batch)
    p_m, _, st_m = step_epcp(params, init_state(ravel, config), batch)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    assert int(st_s.num_cg_iters) == int(st_m.num_cg_iters)
    assert tuple(p_m["blocks"][0]["w1"].sharding.spec) == (
        "model", None, None,
    )


def test_moe_hessian_matvec_matches_dense_oracle():
    """The HESSIAN curvature path through top-2 routing: the routing masks
    are piecewise-constant (argmax/one_hot), so away from routing
    boundaries the loss is smooth in params and hvp_fn must match the
    dense jax.hessian of the same loss -- pinning that forward-over-
    reverse flows through the einsum dispatch, capacity clipping and gate
    renormalization (curvature_opt="hessian" on the MoE family)."""
    from pytorchhessianfree_tpu.ops.curvature import hvp_fn

    key = jax.random.PRNGKey(9)
    params = init_moe_decoder_lm(
        key, vocab=8, d_model=8, n_heads=2, n_layers=1, d_ff=8,
        n_experts=2, max_len=4, dtype=jnp.float64,
    )
    ravel = TrainableRavel(params)
    tokens = jax.random.randint(jax.random.PRNGKey(90), (2, 4), 0, 8)

    def full_loss(p):
        return next_token_loss(moe_decoder_lm_apply(p, tokens, n_heads=2),
                               tokens)

    loss, grad, hvp = hvp_fn(full_loss, params)
    H = jax.hessian(lambda v: full_loss(ravel.unravel(v)))(
        ravel.ravel(params)
    )

    rng = np.random.default_rng(9)
    for _ in range(3):
        v = jnp.asarray(rng.standard_normal(ravel.dim), ravel.dtype)
        Hv = ravel.ravel(hvp(ravel.unravel(v)))
        np.testing.assert_allclose(np.asarray(Hv), np.asarray(H @ v),
                                   atol=1e-9)


def test_moe_trains_with_hessian_curvature():
    """Full HF step with curvature_opt='hessian' (saddle-free handling for
    the indefinite Hessian) trains the MoE decoder."""
    key = jax.random.PRNGKey(10)
    params = init_moe_decoder_lm(
        key, vocab=12, d_model=16, n_layers=2, d_ff=32, n_experts=4,
        max_len=8,
    )
    fns = HFModelFns(
        model_fn=lambda p, t: moe_decoder_lm_apply(p, t),
        loss_outer=next_token_loss,
    )
    from pytorchhessianfree_tpu import CGConfig

    config = HFConfig(
        damping=1.0, cg_max_iter=15, curvature_opt="hessian",
        cg=CGConfig(nonpos_curv_option="saddle-free"),
    )
    ravel = TrainableRavel(params, pad_to_multiple=8)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    tokens = jax.random.randint(jax.random.PRNGKey(91), (4, 8), 0, 12)
    losses = []
    for i in range(3):
        params, state, stats = step(params, state, (tokens, tokens))
        losses.append(float(stats.final_loss))
        assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0]
