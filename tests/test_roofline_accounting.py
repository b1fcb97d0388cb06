"""Pin the FLOP-accounting methodology behind benchmarks/decoder_roofline.py.

The round-5 MFU numbers rest on isolating one amortized GGN matvec's
marginal cost as the DIFFERENCE of two straight-line programs
(linearize + 1 matvec) - (linearize only).  Two things must hold:

1. for a nonlinear model (residuals alive, as in the decoder) the
   marginal is a small multiple of the forward's matmul FLOPs -- the
   jvp+vjp pay ~2 matmuls per param-dependent matmul operand (the
   analytic bound is 4x forward when every operand varies, less when
   data enters one side, as in a first layer);
2. dividing a fori_loop CHAIN program's cost by its trip count is wrong
   (cost_analysis counts a while-loop body ONCE) -- pinned so nobody
   reintroduces that bug.
"""

import jax
import jax.numpy as jnp

from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn


def _cost(jitted, *args):
    ca = jitted.lower(*args).compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


B, D = 32, 64
key = jax.random.PRNGKey(0)
X = jax.random.normal(jax.random.PRNGKey(1), (B, D), jnp.float32)
Y = jax.random.randint(jax.random.PRNGKey(2), (B,), 0, D)
P0 = {
    "w1": jax.random.normal(key, (D, D), jnp.float32) * 0.1,
    "w2": jax.random.normal(key, (D, D), jnp.float32) * 0.1,
}
FWD_MATMUL = 2.0 * B * D * D * 2  # two [B,D]@[D,D] matmuls


def _model(p):
    return jnp.tanh(X @ p["w1"]) @ p["w2"]


def _outer(out):
    logp = jax.nn.log_softmax(out)
    return -jnp.mean(logp[jnp.arange(B), Y])


@jax.jit
def _one_mv(p, v):
    _, _, _, gv = ggnvp_fn(_model, _outer, p)
    return gv(v)


@jax.jit
def _lin_only(p, v):
    loss, _, _, _ = ggnvp_fn(_model, _outer, p)
    return loss + 0.0 * v["w1"][0, 0]


def test_matvec_marginal_is_a_forward_multiple():
    """Marginal matmul work: layer-1 jvp pays 1 matmul (x is data),
    layer-2 jvp pays 2, the vjp pays 2 + 1 (wrt-x cotangent DCE'd) -->
    analytic 3x forward for this shape, plus elementwise/softmax terms.
    Assert the measured band around it (methodology, not exact ALU
    bookkeeping)."""
    v = jax.tree_util.tree_map(jnp.ones_like, P0)
    marginal = _cost(_one_mv, P0, v) - _cost(_lin_only, P0, v)
    ratio = marginal / FWD_MATMUL
    assert 2.0 <= ratio <= 4.5, ratio


def test_moe_matvec_marginal_within_hand_bound():
    """benchmarks/moe_roofline.py's hand count is an UPPER bound for the
    MoE: the 0/1 dispatch tensors are piecewise-constant in the router
    probabilities (argmax/one_hot), so XLA DCEs their jvp terms.  Pin
    that the XLA marginal sits inside (1.0, 4.5)x the forward hand count
    -- i.e. below the 4x-every-operand bound but the same order."""
    from benchmarks.moe_roofline import forward_flops
    from pytorchhessianfree_tpu.models import next_token_loss
    from pytorchhessianfree_tpu.models.moe import (
        init_moe_decoder_lm,
        moe_decoder_lm_apply,
    )

    d, L, f, h, E, b, T, V = 64, 2, 128, 4, 4, 2, 32, 1024
    params = init_moe_decoder_lm(
        jax.random.PRNGKey(0), vocab=V, d_model=d, n_heads=h,
        n_layers=L, d_ff=f, n_experts=E, max_len=T,
    )
    tokens = jax.random.randint(jax.random.PRNGKey(3), (b, T), 0, V)

    def model(p):
        return moe_decoder_lm_apply(p, tokens, n_heads=h)

    @jax.jit
    def one_mv(p, v):
        _, _, _, gv = ggnvp_fn(model, lambda o: next_token_loss(o, tokens),
                               p)
        return gv(v)

    @jax.jit
    def lin_only(p, v):
        loss, _, _, _ = ggnvp_fn(
            model, lambda o: next_token_loss(o, tokens), p
        )
        return loss + 0.0 * v["embed"][0, 0]

    v = jax.tree_util.tree_map(jnp.ones_like, params)
    marginal = _cost(one_mv, params, v) - _cost(lin_only, params, v)
    fwd_hand, _, _, _ = forward_flops(b, T, d, f, L, V, E, 2, 1)
    ratio = marginal / fwd_hand
    assert 1.0 <= ratio <= 4.5, ratio


def test_chain_program_counts_loop_body_once():
    """The bug the difference method avoids: a 50-matvec fori_loop chain's
    cost_analysis is ~1 body + linearization, NOT 50x -- dividing by the
    trip count would understate per-matvec FLOPs ~50x."""
    N = 50

    @jax.jit
    def chain(p, v):
        _, _, _, gv = ggnvp_fn(_model, _outer, p)

        def body(_, u):
            w = gv(u)
            return jax.tree_util.tree_map(
                lambda a: a / (1e-9 + sum(
                    jnp.vdot(x, x) for x in jax.tree_util.tree_leaves(w)
                )),
                w,
            )

        return jax.lax.fori_loop(0, N, body, v)

    v = jax.tree_util.tree_map(jnp.ones_like, P0)
    chain_cost = _cost(chain, P0, v)
    v2 = jax.tree_util.tree_map(jnp.ones_like, P0)
    marginal = _cost(_one_mv, P0, v2) - _cost(_lin_only, P0, v2)
    # if the body were counted N times the chain would cost >= N * marginal
    assert chain_cost < 0.25 * N * marginal, (chain_cost, marginal)
