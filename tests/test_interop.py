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
