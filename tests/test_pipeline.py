"""Pipeline parallelism (parallel/pipeline.py): the GPipe microbatch
schedule must be pure dataflow reordering -- exact parity with the
sequential layer scan for forward, gradient, GGN matvec AND the full HF
step, on a virtual stage mesh."""

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
    decoder_lm_apply,
    init_decoder_lm,
    next_token_loss,
)
from pytorchhessianfree_tpu.models.transformer import (
    _block,
    _layernorm,
    stack_blocks,
)
from pytorchhessianfree_tpu.parallel.mesh import make_mesh
from pytorchhessianfree_tpu.parallel.pipeline import pipeline_blocks

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs 4 (virtual) devices"
)

N_LAYERS, N_HEADS = 4, 4


def _params(seed=0, vocab=16, d=16, d_ff=32, max_len=8):
    return init_decoder_lm(
        jax.random.PRNGKey(seed), vocab=vocab, d_model=d,
        n_layers=N_LAYERS, d_ff=d_ff, max_len=max_len, dtype=jnp.float64,
    )


def _pipelined_apply(mesh, n_microbatches=2, remat=False):
    """Decoder-LM forward with the blocks run as a pipeline over `mesh`."""

    def block_fn(blk, h):
        return _block(blk, h, N_HEADS, causal=True)

    if remat:
        block_fn = jax.checkpoint(block_fn)

    def apply(params, tokens):
        T = tokens.shape[1]
        x = params["embed"][tokens] + params["pos"][:T]
        x = pipeline_blocks(
            stack_blocks(params["blocks"]), x, block_fn, mesh,
            n_microbatches=n_microbatches,
        )
        x = _layernorm(params["ln_f"], x)
        return x @ params["embed"].T

    return apply


def test_pipeline_matches_sequential_fwd_grad_ggn():
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn

    params = _params()
    mesh = make_mesh(4, axis_names=("stage",))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 16)
    pl = _pipelined_apply(mesh)

    out_p = pl(params, tokens)
    out_s = decoder_lm_apply(params, tokens, n_heads=N_HEADS)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_s),
                               rtol=1e-12, atol=1e-13)

    results = []
    for apply in (pl, lambda p, t: decoder_lm_apply(p, t, n_heads=N_HEADS)):
        loss, _, grad, gv = ggnvp_fn(
            lambda p: apply(p, tokens),
            lambda o: next_token_loss(o, tokens),
            params,
        )
        v = jax.tree_util.tree_map(jnp.ones_like, params)
        results.append((loss, grad, gv(v)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-13)
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1:]),
                    jax.tree_util.tree_leaves(results[1][1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-11)


def test_pipeline_hf_step_matches_sequential():
    """A full HF step with the pipelined model follows the plain
    scan-layers step's trajectory (same CG iterations, params allclose)."""
    params = _params(seed=2)
    mesh = make_mesh(4, axis_names=("stage",))
    tokens = jax.random.randint(jax.random.PRNGKey(3), (4, 8), 0, 16)
    config = HFConfig(damping=1.0, cg_max_iter=15)
    ravel = TrainableRavel(params)

    fns_seq = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=N_HEADS),
        loss_outer=next_token_loss,
    )
    fns_pl = HFModelFns(
        model_fn=_pipelined_apply(mesh), loss_outer=next_token_loss
    )

    step_s = make_hf_step(fns_seq, config, ravel)
    step_p = make_hf_step(fns_pl, config, ravel)
    p_s, _, st_s = step_s(params, init_state(ravel, config),
                          (tokens, tokens))
    p_p, _, st_p = step_p(params, init_state(ravel, config),
                          (tokens, tokens))
    assert int(st_s.num_cg_iters) == int(st_p.num_cg_iters)
    for a, b in zip(jax.tree_util.tree_leaves(p_s),
                    jax.tree_util.tree_leaves(p_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-9)


def test_pipeline_remat_and_microbatch_counts():
    params = _params(seed=4)
    mesh = make_mesh(4, axis_names=("stage",))
    tokens = jax.random.randint(jax.random.PRNGKey(5), (4, 8), 0, 16)
    base = decoder_lm_apply(params, tokens, n_heads=N_HEADS)
    for kw in ({"n_microbatches": 1}, {"n_microbatches": 4},
               {"n_microbatches": 2, "remat": True}):
        out = _pipelined_apply(mesh, **kw)(params, tokens)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-12, atol=1e-13, err_msg=str(kw))


@pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)
def test_pipeline_composes_with_solver_sharding():
    """pp x ZeRO: the pipelined model runs over the `stage` axis of a
    (stage=4, model=2) mesh while the CG vector space shards over
    `model` (make_sharded_hf_step, data_axis=None); trajectory equals the
    plain single-device step and the warm start is model-sharded.  (XLA
    logs 'involuntary full rematerialization' warnings on the small
    flat-vector <-> stacked-weights reshardings at the pipeline boundary
    -- a resharding inefficiency on tiny tensors, not an error.)"""
    from pytorchhessianfree_tpu.parallel.sharded import make_sharded_hf_step

    params = _params(seed=8)
    mesh = make_mesh(8, axis_names=("stage", "model"), shape=(4, 2))
    tokens = jax.random.randint(jax.random.PRNGKey(9), (4, 8), 0, 16)
    config = HFConfig(damping=1.0, cg_max_iter=10)
    ravel = TrainableRavel(params, pad_to_multiple=8)

    def block_fn(blk, h):
        return _block(blk, h, N_HEADS, causal=True)

    def pp_model(p, toks):
        from pytorchhessianfree_tpu.models.transformer import _layernorm

        x = p["embed"][toks] + p["pos"][: toks.shape[1]]
        x = pipeline_blocks(
            stack_blocks(p["blocks"]), x, block_fn, mesh,
            stage_axis="stage", n_microbatches=2,
        )
        x = _layernorm(p["ln_f"], x)
        return x @ p["embed"].T

    fns_pp = HFModelFns(model_fn=pp_model, loss_outer=next_token_loss)
    fns_seq = HFModelFns(
        model_fn=lambda p, t: decoder_lm_apply(p, t, n_heads=N_HEADS),
        loss_outer=next_token_loss,
    )
    step_pp = make_sharded_hf_step(
        fns_pp, config, ravel, mesh, data_axis=None, model_axis="model"
    )
    step_seq = make_hf_step(fns_seq, config, ravel)

    p_m, s_m, st_m = step_pp(params, init_state(ravel, config),
                             (tokens, tokens))
    p_s, _, st_s = step_seq(params, init_state(ravel, config),
                            (tokens, tokens))
    assert int(st_m.num_cg_iters) == int(st_s.num_cg_iters)
    for a, b in zip(jax.tree_util.tree_leaves(p_m),
                    jax.tree_util.tree_leaves(p_s)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-9)
    assert tuple(s_m.x0.sharding.spec) == ("model",)


def test_pipeline_validation():
    params = _params(seed=6)
    mesh = make_mesh(4, axis_names=("stage",))
    tokens = jax.random.randint(jax.random.PRNGKey(7), (4, 8), 0, 16)

    three = {"blocks": params["blocks"][:3]}  # 3 layers over 4 stages
    with pytest.raises(ValueError, match="do not divide over"):
        x = jnp.zeros((4, 8, 16))
        pipeline_blocks(
            stack_blocks(three["blocks"]), x,
            lambda b, h: h, mesh,
        )
    with pytest.raises(ValueError, match="microbatches"):
        _pipelined_apply(mesh, n_microbatches=3)(params, tokens)


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-v"]))


def test_pipeline_hessian_matvec_matches_sequential():
    """The HESSIAN path (forward-over-reverse, hvp_fn) through the GPipe
    schedule: lax.scan + ppermute + masked selects all transpose AND
    linearize, so the pipelined full-loss Hessian matvec must equal the
    sequential one exactly (f64)."""
    from pytorchhessianfree_tpu.ops.curvature import hvp_fn

    params = _params(seed=3)
    mesh = make_mesh(4, axis_names=("stage",))
    tokens = jax.random.randint(jax.random.PRNGKey(4), (4, 8), 0, 16)
    pl = _pipelined_apply(mesh)

    results = []
    for apply in (pl, lambda p, t: decoder_lm_apply(p, t, n_heads=N_HEADS)):
        loss, grad, hvp = hvp_fn(
            lambda p: next_token_loss(apply(p, tokens), tokens), params
        )
        v = jax.tree_util.tree_map(jnp.ones_like, params)
        results.append((loss, grad, hvp(v)))
    np.testing.assert_allclose(results[0][0], results[1][0], rtol=1e-13)
    for a, b in zip(jax.tree_util.tree_leaves(results[0][1:]),
                    jax.tree_util.tree_leaves(results[1][1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-10, atol=1e-11)
