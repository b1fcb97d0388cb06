"""Model-family tests: shapes, determinism, trainability with the optimizer
at tiny sizes (the reference's model zoo is torchvision/DeepOBS-provided;
ours is in-repo and needs its own coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import (
    allcnnc_apply,
    cross_entropy_loss,
    init_allcnnc,
    init_resnet18,
    l2_regularizer,
    resnet18_apply,
)


def test_resnet18_shapes_and_param_count():
    key = jax.random.PRNGKey(0)
    params = init_resnet18(key, num_classes=10, in_channels=1)
    n = sum(a.size for a in jax.tree_util.tree_leaves(params))
    # torchvision resnet18(num_classes=10) with a 1-channel 7x7 stem has
    # 11,175,370 params (conv/bn/fc); architecture parity check.
    assert n == 11_175_370
    x = jax.random.normal(key, (2, 28, 28, 1), jnp.float32)
    out = resnet18_apply(params, x)
    assert out.shape == (2, 10)
    # deterministic forward (pure batch-stats BN)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(resnet18_apply(params, x))
    )


def test_allcnnc_shapes():
    key = jax.random.PRNGKey(0)
    params = init_allcnnc(key, num_classes=100)
    x = jax.random.normal(key, (2, 32, 32, 3), jnp.float32)
    out = allcnnc_apply(params, x)
    assert out.shape == (2, 100)
    reg = float(l2_regularizer(params))
    assert reg > 0


def test_transformer_trains_with_hf():
    """GGN through softmax attention + layernorm: a compact transformer
    classifier must learn a synthetic token rule under the full HF pipeline
    (a model family beyond the reference's MLP/CNN zoo)."""
    import functools

    from pytorchhessianfree_tpu.models import (
        init_transformer,
        transformer_apply,
    )

    key = jax.random.PRNGKey(0)
    params = init_transformer(key)
    tokens = jax.random.randint(key, (16, 12), 0, 64)
    labels = tokens.sum(axis=1) % 4  # learnable rule

    opt = HessianFree(
        params,
        model_fn=functools.partial(transformer_apply, n_heads=4),
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=30,
    )
    losses = [opt.step((tokens, labels)) for _ in range(5)]
    assert losses[-1] < 0.2 * opt.history["init_losses"][0]
    assert all(np.isfinite(v) for v in losses)


def test_transformer_scan_layers_bit_identical():
    """scan_layers stacks the block weights and lax.scans one traced block;
    same ops per layer in the same order as the unrolled Python loop, so
    forward, gradient, and GGN matvec must agree to f64 ulp-level tolerance
    (XLA fuses the two programs differently, so exact bit-equality is not
    guaranteed; observed drift is ~1e-15)."""
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn
    from pytorchhessianfree_tpu.models import (
        init_transformer,
        transformer_apply,
    )

    key = jax.random.PRNGKey(3)
    params = init_transformer(
        key, vocab=16, d_model=16, n_layers=3, d_ff=32, num_classes=4,
        max_len=10, dtype=jnp.float64,
    )
    tokens = jax.random.randint(key, (4, 10), 0, 16)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (4,), 0, 4)

    out_scan = transformer_apply(params, tokens, scan_layers=True)
    out_unroll = transformer_apply(params, tokens, scan_layers=False)
    np.testing.assert_allclose(np.asarray(out_scan),
                               np.asarray(out_unroll),
                               rtol=1e-12, atol=1e-14)

    results = {}
    for scan in (True, False):
        loss, _, grad, gv = ggnvp_fn(
            lambda p: transformer_apply(p, tokens, scan_layers=scan),
            lambda o: cross_entropy_loss(o, labels),
            params,
        )
        v = jax.tree_util.tree_map(jnp.ones_like, params)
        results[scan] = (loss, grad, gv(v))
    np.testing.assert_allclose(results[True][0], results[False][0],
                               rtol=1e-13)
    for a, b in zip(jax.tree_util.tree_leaves(results[True][1:]),
                    jax.tree_util.tree_leaves(results[False][1:])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_transformer_remat_matches():
    """remat=True (per-layer jax.checkpoint inside the scan) changes memory
    scheduling, not math: forward and gradient match the plain scan."""
    from pytorchhessianfree_tpu.models import (
        init_transformer,
        transformer_apply,
    )

    key = jax.random.PRNGKey(5)
    params = init_transformer(
        key, vocab=16, d_model=16, n_layers=2, d_ff=32, num_classes=4,
        max_len=8, dtype=jnp.float64,
    )
    tokens = jax.random.randint(key, (4, 8), 0, 16)
    labels = jax.random.randint(jax.random.fold_in(key, 1), (4,), 0, 4)

    def loss_of(p, remat):
        out = transformer_apply(p, tokens, remat=remat)
        return cross_entropy_loss(out, labels)

    l0, g0 = jax.value_and_grad(lambda p: loss_of(p, False))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss_of(p, True))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-14)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-12, atol=1e-12)


def test_decoder_lm_shapes_and_causality():
    """The causal LM emits per-position logits, and position t's logits must
    not depend on tokens at positions > t (strict causal mask)."""
    from pytorchhessianfree_tpu.models import decoder_lm_apply, init_decoder_lm

    key = jax.random.PRNGKey(0)
    params = init_decoder_lm(key, vocab=16, d_model=16, n_layers=2,
                             d_ff=32, max_len=10)
    tokens = jax.random.randint(key, (3, 10), 0, 16)
    logits = decoder_lm_apply(params, tokens)
    assert logits.shape == (3, 10, 16)

    # perturb the LAST token; logits at positions < T-1 must be unchanged
    perturbed = tokens.at[:, -1].set((tokens[:, -1] + 1) % 16)
    logits_p = decoder_lm_apply(params, perturbed)
    np.testing.assert_array_equal(
        np.asarray(logits[:, :-1]), np.asarray(logits_p[:, :-1])
    )
    # tied head: no separate head matrix, embed is reused
    assert "head" not in params
    n_untied = sum(
        a.size
        for a in jax.tree_util.tree_leaves(
            init_decoder_lm(key, vocab=16, d_model=16, n_layers=2,
                            d_ff=32, max_len=10, tied_head=False)
        )
    )
    n_tied = sum(a.size for a in jax.tree_util.tree_leaves(params))
    assert n_untied > n_tied


def test_decoder_lm_trains_with_hf():
    """Next-token HF training: the loss spans the sequence axis (every
    position contributes a softmax GGN block), exercising curvature through
    the causal-attention chain.  Task: sequences follow tok[t+1] =
    (tok[t] + 1) % vocab, fully learnable."""
    import functools

    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        next_token_loss,
    )

    key = jax.random.PRNGKey(0)
    vocab, T = 12, 9
    params = init_decoder_lm(key, vocab=vocab, d_model=16, n_layers=2,
                             d_ff=32, max_len=T)
    start = jax.random.randint(key, (24, 1), 0, vocab)
    tokens = (start + jnp.arange(T)[None, :]) % vocab

    opt = HessianFree(
        params,
        model_fn=functools.partial(decoder_lm_apply, n_heads=4),
        loss_outer=next_token_loss,
        damping=1.0,
        cg_max_iter=30,
    )
    # batch = (inputs, targets): the loss reads the raw tokens as targets
    losses = [opt.step((tokens, tokens)) for _ in range(6)]
    assert losses[-1] < 0.3 * opt.history["init_losses"][0]
    assert all(np.isfinite(v) for v in losses)


def test_tiny_convnet_trains_with_hf():
    """A reduced All-CNN-C-style net must decrease its loss under the full HF
    pipeline -- the 'one conv model running end-to-end' smoke for CI."""
    key = jax.random.PRNGKey(0)
    # tiny variant: override widths by building a resnet-free small conv net
    from pytorchhessianfree_tpu.models.resnet import _conv_init, conv

    k1, k2 = jax.random.split(key)
    params = {
        "c1": _conv_init(k1, 3, 3, 1, 8, jnp.float32),
        "c2": _conv_init(k2, 3, 3, 8, 4, jnp.float32),
    }

    def model_fn(p, x):
        h = jax.nn.relu(conv(x, p["c1"], stride=2))
        h = conv(h, p["c2"], stride=1)
        return jnp.mean(h, axis=(1, 2))

    opt = HessianFree(
        params,
        model_fn=model_fn,
        loss_outer=cross_entropy_loss,
        damping=1.0,
        cg_max_iter=20,
    )
    x = jax.random.normal(key, (8, 8, 8, 1), jnp.float32)
    y = jax.random.randint(key, (8,), 0, 4)
    losses = [opt.step((x, y)) for _ in range(3)]
    assert opt.history["init_losses"][0] > opt.history["init_losses"][-1]
    assert all(np.isfinite(v) for v in losses)


def test_dropout_mlp_trains_with_fixed_key_per_step():
    """The POSITIVE stochastic-model path (the reference only advises
    'consider calling model.eval()', reference optimizer.py:406-409): a
    dropout MLP trains under full HF when the PRNG key rides in the batch
    pytree -- one key per step, so gradient, every CG matvec, and every
    trial forward share the same masks -- while the rethreaded variant of
    the SAME model is flagged by check_deterministic."""
    import functools

    from pytorchhessianfree_tpu import (
        HFConfig,
        HFModelFns,
        TrainableRavel,
        check_deterministic,
    )
    from pytorchhessianfree_tpu.models import init_mlp, mlp_dropout_apply
    from pytorchhessianfree_tpu.models.mlp import mse_loss

    key = jax.random.PRNGKey(0)
    params = init_mlp(key, sizes=(7, 16, 16, 3), dtype=jnp.float64)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (32, 7), jnp.float64)
    w_true = jax.random.normal(ky, (7, 3), jnp.float64)
    y = jnp.tanh(x @ w_true)

    opt = HessianFree(
        params,
        model_fn=functools.partial(mlp_dropout_apply, rate=0.1),
        loss_outer=mse_loss,
        damping=1.0,
        cg_max_iter=25,
        pad_to_multiple=None,
    )
    losses = []
    for i in range(8):
        step_key = jax.random.fold_in(jax.random.PRNGKey(42), i)
        losses.append(opt.step(((x, step_key), y)))
    assert losses[-1] < 0.5 * opt.history["init_losses"][0]
    assert all(np.isfinite(v) for v in losses)

    # same model, key fixed inside the closure instead of the batch:
    # check_deterministic(fns_factory=...) flags it as stochastic
    def rethreaded_factory(k):
        return HFModelFns(
            model_fn=lambda p, inp: mlp_dropout_apply(
                p, (inp, k), rate=0.1
            ),
            loss_outer=mse_loss,
        )

    ravel = TrainableRavel(opt.params)
    res = check_deterministic(
        rethreaded_factory(jax.random.PRNGKey(1)),
        HFConfig(damping=1.0),
        ravel,
        opt.params,
        (x, y),
        fns_factory=rethreaded_factory,
    )
    assert res["rng_invariant"] is False
    # while the key-in-batch form is a pure function of (params, batch)
    fns_fixed = HFModelFns(
        model_fn=functools.partial(mlp_dropout_apply, rate=0.1),
        loss_outer=mse_loss,
    )
    res2 = check_deterministic(
        fns_fixed,
        HFConfig(damping=1.0),
        ravel,
        opt.params,
        ((x, jax.random.PRNGKey(5)), y),
    )
    assert res2["forward_deterministic"] and res2["mvp_deterministic"]


def test_resnet18_width_scale():
    """width_scale shrinks every channel (same topology); forward shapes
    hold because the apply reads all shapes from the params."""
    from pytorchhessianfree_tpu.models import init_resnet18, resnet18_apply

    key = jax.random.PRNGKey(0)
    tiny = init_resnet18(key, num_classes=10, in_channels=1,
                         width_scale=0.125)
    full = init_resnet18(key, num_classes=10, in_channels=1)
    n_tiny = sum(a.size for a in jax.tree_util.tree_leaves(tiny))
    n_full = sum(a.size for a in jax.tree_util.tree_leaves(full))
    assert n_tiny < n_full / 20
    assert tiny["stem"].shape[-1] == 8  # 64 * 0.125
    x = jax.random.normal(key, (2, 28, 28, 1), jnp.float32)
    out = resnet18_apply(tiny, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_next_token_loss_mask():
    """mask weights target positions: all-ones == unmasked; zeroing a
    column removes exactly that position's term; an HF step trains a
    padded batch (mask threaded through the batch pytree)."""
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

    key = jax.random.PRNGKey(30)
    logits = jax.random.normal(key, (3, 8, 16), jnp.float64)
    tokens = jax.random.randint(key, (3, 8), 0, 16)

    full = next_token_loss(logits, tokens)
    ones = next_token_loss(logits, tokens, mask=jnp.ones((3, 8)))
    np.testing.assert_allclose(float(full), float(ones), rtol=1e-14)

    # drop the last target position: equals the mean over the first T-2
    mask = jnp.ones((3, 8)).at[:, -1].set(0.0)
    kept = next_token_loss(logits, tokens, mask=mask)
    manual = next_token_loss(logits[:, :-1, :], tokens[:, :-1])
    np.testing.assert_allclose(float(kept), float(manual), rtol=1e-13)

    # all-masked: finite (guarded denominator)
    z = next_token_loss(logits, tokens, mask=jnp.zeros((3, 8)))
    assert np.isfinite(float(z))

    # HF trains with the mask riding in the batch
    params = init_decoder_lm(key, vocab=16, d_model=16, n_layers=1,
                             d_ff=32, max_len=8, dtype=jnp.float64)
    fns = HFModelFns(
        model_fn=lambda p, batch: decoder_lm_apply(p, batch[0]),
        loss_outer=lambda out, batch: next_token_loss(
            out, batch[0], mask=batch[1]
        ),
    )
    config = HFConfig(damping=1.0, cg_max_iter=10)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    batch = ((tokens, mask), (tokens, mask))
    p, s, stats = step(params, init_state(ravel, config), batch)
    assert float(stats.final_loss) < float(stats.init_loss)


def test_chunked_attention_matches_full():
    """attn_chunk row-blocks the softmax; rows are independent so numerics
    must match full attention at f64 for forward, gradient AND GGN matvec,
    on both the encoder (bidirectional) and the causal decoder."""
    from pytorchhessianfree_tpu.ops.curvature import ggnvp_fn
    from pytorchhessianfree_tpu.models import (
        decoder_lm_apply,
        init_decoder_lm,
        init_transformer,
        next_token_loss,
        transformer_apply,
    )

    key = jax.random.PRNGKey(11)
    tokens = jax.random.randint(key, (3, 8), 0, 16)

    # encoder
    enc = init_transformer(
        key, vocab=16, d_model=16, n_layers=2, d_ff=32, num_classes=4,
        max_len=8, dtype=jnp.float64,
    )
    labels = jax.random.randint(jax.random.fold_in(key, 1), (3,), 0, 4)
    out_full = transformer_apply(enc, tokens)
    out_chunk = transformer_apply(enc, tokens, attn_chunk=2)
    np.testing.assert_allclose(np.asarray(out_full), np.asarray(out_chunk),
                               rtol=1e-12, atol=1e-14)

    # decoder: forward + grad + GGN matvec through the chunked path
    dec = init_decoder_lm(key, vocab=16, d_model=16, n_layers=2,
                          d_ff=32, max_len=8, dtype=jnp.float64)
    results = {}
    for chunk in (None, 2, 4):
        loss, _, grad, gv = ggnvp_fn(
            lambda p: decoder_lm_apply(p, tokens, attn_chunk=chunk),
            lambda o: next_token_loss(o, tokens),
            dec,
        )
        v = jax.tree_util.tree_map(jnp.ones_like, dec)
        results[chunk] = (loss, grad, gv(v))
    for chunk in (2, 4):
        np.testing.assert_allclose(results[None][0], results[chunk][0],
                                   rtol=1e-13)
        for a, b in zip(jax.tree_util.tree_leaves(results[None][1:]),
                        jax.tree_util.tree_leaves(results[chunk][1:])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-11, atol=1e-12)

    # encoder grad parity too (bidirectional softmax rows)
    def enc_loss(p, chunk):
        return cross_entropy_loss(
            transformer_apply(p, tokens, attn_chunk=chunk), labels
        )

    g_full = jax.grad(lambda p: enc_loss(p, None))(enc)
    g_chunk = jax.grad(lambda p: enc_loss(p, 2))(enc)
    for a, b in zip(jax.tree_util.tree_leaves(g_full),
                    jax.tree_util.tree_leaves(g_chunk)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-12)


def test_chunked_attention_preserves_causality():
    """The per-block causal mask must reproduce strict causality across
    chunk boundaries: perturbing the last token leaves logits at earlier
    positions unchanged."""
    from pytorchhessianfree_tpu.models import decoder_lm_apply, init_decoder_lm

    key = jax.random.PRNGKey(12)
    params = init_decoder_lm(key, vocab=16, d_model=16, n_layers=2,
                             d_ff=32, max_len=12)
    tokens = jax.random.randint(key, (3, 12), 0, 16)
    perturbed = tokens.at[:, -1].set((tokens[:, -1] + 1) % 16)
    a = decoder_lm_apply(params, tokens, attn_chunk=4)
    b = decoder_lm_apply(params, perturbed, attn_chunk=4)
    np.testing.assert_array_equal(np.asarray(a[:, :-1, :]),
                                  np.asarray(b[:, :-1, :]))
    assert not np.allclose(np.asarray(a[:, -1, :]), np.asarray(b[:, -1, :]))


def test_chunked_attention_rejects_non_dividing_chunk():
    from pytorchhessianfree_tpu.models import decoder_lm_apply, init_decoder_lm

    key = jax.random.PRNGKey(13)
    params = init_decoder_lm(key, vocab=16, d_model=16, n_layers=1,
                             d_ff=32, max_len=10)
    tokens = jax.random.randint(key, (2, 10), 0, 16)
    with pytest.raises(ValueError, match="must divide"):
        decoder_lm_apply(params, tokens, attn_chunk=3)


def test_chunked_attention_composes_with_remat_and_trains():
    """attn_chunk + per-layer remat + scan_layers together, through a full
    HF step: gradient parity with the plain path, and the loss decreases."""
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

    key = jax.random.PRNGKey(14)
    params = init_decoder_lm(key, vocab=16, d_model=16, n_layers=2,
                             d_ff=32, max_len=8, dtype=jnp.float64)
    tokens = jax.random.randint(key, (4, 8), 0, 16)

    def loss_of(p, **kw):
        return next_token_loss(decoder_lm_apply(p, tokens, **kw), tokens)

    g0 = jax.grad(lambda p: loss_of(p))(params)
    g1 = jax.grad(
        lambda p: loss_of(p, attn_chunk=2, remat=True)
    )(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-11, atol=1e-12)

    fns = HFModelFns(
        model_fn=lambda p, x: decoder_lm_apply(
            p, x, attn_chunk=2, remat=True
        ),
        loss_outer=next_token_loss,
    )
    config = HFConfig(damping=1.0, cg_max_iter=15)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)
    state = init_state(ravel, config)
    p, s = params, state
    first = last = None
    for _ in range(2):
        p, s, stats = step(p, s, (tokens, tokens))
        first = float(stats.init_loss) if first is None else first
        last = float(stats.final_loss)
    assert last < first
