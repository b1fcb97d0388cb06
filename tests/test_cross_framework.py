"""Cross-framework numerical parity (BASELINE.json north-star requirement).

The reference itself cannot run here (BackPACK absent), so parity is checked
against an INDEPENDENT implementation of the same algorithm: curvature
products via torch.func on an identical-weight PyTorch model, and a
host-side NumPy replica of the reference's solver semantics (PCG with
Martens' criterion and the ceil(1.3^j)-1 grid, LM damping, efficient
backtracking, Armijo line search).  Two-step parameter trajectories must
match in f64 to tight tolerances.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from pytorchhessianfree_tpu import (
    HFConfig,
    HFModelFns,
    TrainableRavel,
    init_state,
    make_hf_step,
)

SIZES = (5, 4, 3)


# ---------------------------------------------------------------------------
# identical two-framework model: tanh MLP with shared weights
# ---------------------------------------------------------------------------


def _make_problem(seed):
    rng = np.random.default_rng(seed)
    Ws = [
        rng.standard_normal((SIZES[i], SIZES[i + 1])) / np.sqrt(SIZES[i])
        for i in range(len(SIZES) - 1)
    ]
    bs = [rng.standard_normal((SIZES[i + 1],)) * 0.1 for i in range(len(SIZES) - 1)]
    x = rng.standard_normal((12, SIZES[0]))
    y = rng.standard_normal((12, SIZES[-1]))
    return Ws, bs, x, y


def _jax_setup(Ws, bs, x, y):
    params = {
        f"l{i}": {"w": jnp.asarray(W), "b": jnp.asarray(b)}
        for i, (W, b) in enumerate(zip(Ws, bs))
    }

    def model_fn(p, inputs):
        h = jnp.tanh(inputs @ p["l0"]["w"] + p["l0"]["b"])
        return h @ p["l1"]["w"] + p["l1"]["b"]

    def mse(o, t):
        return jnp.mean((o - t) ** 2)

    return params, model_fn, mse, (jnp.asarray(x), jnp.asarray(y))


def _torch_setup(Ws, bs, x, y):
    # insertion order matches KEYS (torch pytree specs are order-sensitive)
    tp = {
        "l0.b": torch.tensor(bs[0], dtype=torch.float64, requires_grad=True),
        "l0.w": torch.tensor(Ws[0], dtype=torch.float64, requires_grad=True),
        "l1.b": torch.tensor(bs[1], dtype=torch.float64, requires_grad=True),
        "l1.w": torch.tensor(Ws[1], dtype=torch.float64, requires_grad=True),
    }
    tx = torch.tensor(x, dtype=torch.float64)
    ty = torch.tensor(y, dtype=torch.float64)

    def model(p, inputs):
        h = torch.tanh(inputs @ p["l0.w"] + p["l0.b"])
        return h @ p["l1.w"] + p["l1.b"]

    def loss_outer(o):
        return torch.mean((o - ty) ** 2)

    return tp, model, loss_outer, tx


# match JAX's sorted-key pytree flattening order ("b" < "w")
KEYS = ["l0.b", "l0.w", "l1.b", "l1.w"]


def _t_ravel(tree):
    return torch.cat([tree[k].reshape(-1) for k in KEYS])


def _t_unravel(vec, template):
    out, i = {}, 0
    for k in KEYS:
        nelem = template[k].numel()
        out[k] = vec[i : i + nelem].reshape(template[k].shape)
        i += nelem
    return out


def _torch_grad_and_gv(tp, model, loss_outer, tx, reg=None):
    """reg: optional params->scalar regularizer; enters loss and gradient,
    NOT the GGN (reference behavior with a regularized forward closure)."""
    out, vjp_fn = torch.func.vjp(lambda p: model(p, tx), tp)
    _, jvp_from = torch.func.linearize(lambda p: model(p, tx), tp)
    lg = torch.func.grad(loss_outer)
    grad = _t_ravel(vjp_fn(lg(out))[0]).detach()
    loss = loss_outer(out)
    if reg is not None:
        loss = loss + reg(tp)
        grad = grad + _t_ravel(torch.func.grad(reg)(tp)).detach()

    def gv(v_np):
        v = _t_unravel(torch.tensor(v_np, dtype=torch.float64), tp)
        Jv = jvp_from(v)
        _, HJv = torch.func.jvp(lg, (out,), (Jv,))
        return _t_ravel(vjp_fn(HJv)[0]).detach().numpy()

    return float(loss), grad.numpy(), gv


# ---------------------------------------------------------------------------
# NumPy replica of the reference solver semantics
# ---------------------------------------------------------------------------


def _np_cg(A, b, x0, max_iter, tol=1e-5, M=None):
    """Martens-terminated PCG, storage grid ceil(1.3^j)-1, optional precond."""
    from math import ceil, log

    if M is None:
        M = lambda v: v
    grid = sorted(
        {int(np.ceil(1.3**j) - 1) for j in range(ceil(log(max_iter + 1) / log(1.3)) + 1)}
    )
    grid = {g for g in grid if g <= max_iter}
    res_bound = tol * np.linalg.norm(b)
    x = x0.copy()
    stored = {0: x.copy()} if 0 in grid else {}
    r = A(x) - b
    m_hist = [0.5 * np.dot(r - b, x)]
    y_ = M(r)
    ry = np.dot(r, y_)
    p = -y_
    it = 1
    while True:
        Ap = A(p)
        pAp = np.dot(p, Ap)
        alpha = ry / pAp
        x = x + alpha * p
        if it in grid:
            stored[it] = x.copy()
        r = r + alpha * Ap
        m_hist.append(0.5 * np.dot(r - b, x))
        k = max(10, it // 10)
        if k < it and (m_hist[it] - m_hist[it - k]) / (m_hist[it] - m_hist[0]) < 5e-4:
            break
        if it >= max_iter:
            break
        if np.isnan(np.linalg.norm(r)):
            break
        if np.linalg.norm(r) < res_bound:
            break
        y_ = M(r)
        ry_new = np.dot(r, y_)
        beta = ry_new / ry
        ry = ry_new
        p = -y_ + beta * p
        it += 1
    return x, stored, m_hist, it


def _np_backtrack(f, stored, x_final, final_iter):
    f_min = np.inf
    best_iter = final_iter
    best = x_final
    cands = [(final_iter, x_final)] + [
        (i, v) for i, v in sorted(stored.items(), reverse=True) if i < final_iter
    ]
    for it, vec in cands:
        fv = f(vec)
        if fv < f_min:
            f_min, best_iter, best = fv, it, vec
        else:
            break
    return best_iter, best, f_min


def _np_linesearch(f, grad, step, f0, init_alpha=1.0, beta=0.8, c=1e-2, max_iter=20):
    c_dir = c * np.dot(grad, step)
    alpha = init_alpha
    fa = f(alpha * step)
    for _ in range(max_iter):
        if fa <= f0 + alpha * c_dir:
            return alpha, fa
        alpha *= beta
        fa = f(alpha * step)
    return 0.0, f0


def _np_hf_step(tp, model, loss_outer, tx, x0, damping, cg_max_iter=30,
                precond_diag=None, reg=None):
    """One full reference-semantics HF step (GGN) in numpy/torch.func."""
    init_loss, grad, gv = _torch_grad_and_gv(tp, model, loss_outer, tx,
                                             reg=reg)

    def A(v):
        return gv(v) + damping * v

    M = None
    if precond_diag is not None:
        M = lambda v: (precond_diag + damping) ** -0.75 * v
    x_final, stored, m_hist, final_iter = _np_cg(A, -grad, x0, cg_max_iter,
                                                 M=M)
    new_x0 = 0.95 * x_final

    def f(delta):
        trial = _t_unravel(
            _t_ravel(tp) + torch.tensor(delta, dtype=torch.float64), tp
        )
        val = loss_outer(model(trial, tx))
        if reg is not None:
            val = val + reg(trial)
        return float(val)

    # LM damping (f_0 at the warm start)
    f_0 = f(x0)
    f_step = f(x_final)
    rho = (f_step - f_0) / (m_hist[final_iter] - m_hist[0])
    new_damping = damping * (1.5 if rho < 0.25 else (2 / 3 if rho > 0.75 else 1.0))

    _, step_vec, _ = _np_backtrack(f, stored, x_final, final_iter)
    alpha, final_loss = _np_linesearch(f, grad, step_vec, init_loss)

    new_flat = (_t_ravel(tp) + torch.tensor(alpha * step_vec)).detach()
    new_tp = {
        k: v.clone().requires_grad_(True)
        for k, v in _t_unravel(new_flat, tp).items()
    }
    return new_tp, new_x0, new_damping, init_loss, final_loss


# ---------------------------------------------------------------------------
# the parity tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [0, 1])
def test_loss_grad_ggn_matvec_parity(seed):
    Ws, bs, x, y = _make_problem(seed)
    params, model_fn, mse, batch = _jax_setup(Ws, bs, x, y)
    tp, tmodel, touter, tx = _torch_setup(Ws, bs, x, y)

    from pytorchhessianfree_tpu.optimizer import _build_matvec_and_grad

    fns = HFModelFns(model_fn=model_fn, loss_outer=mse)
    ravel = TrainableRavel(params)
    config = HFConfig(damping=0.1)
    j_loss, j_grad, j_mvp = _build_matvec_and_grad(
        fns, config, ravel, params, batch
    )
    t_loss, t_grad, t_gv = _torch_grad_and_gv(tp, tmodel, touter, tx)

    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(j_grad), t_grad, atol=1e-12)

    rng = np.random.default_rng(seed)
    for _ in range(3):
        v = rng.standard_normal(ravel.dim)
        np.testing.assert_allclose(
            np.asarray(j_mvp(jnp.asarray(v))), t_gv(v), atol=1e-11
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_hessian_matvec_parity(seed):
    """Hessian-vector products (forward-over-reverse) must match torch.func's
    jvp-of-grad on the identical model -- the Hessian curvature path analog
    of the GGN check (reference _Hv, optimizer.py:450-455)."""
    Ws, bs, x, y = _make_problem(seed)
    params, model_fn, mse, batch = _jax_setup(Ws, bs, x, y)
    tp, tmodel, touter, tx = _torch_setup(Ws, bs, x, y)

    from pytorchhessianfree_tpu.optimizer import _build_matvec_and_grad

    fns = HFModelFns(model_fn=model_fn, loss_outer=mse)
    ravel = TrainableRavel(params)
    config = HFConfig(curvature_opt="hessian", damping=0.1)
    _, _, j_hvp = _build_matvec_and_grad(fns, config, ravel, params, batch)

    def t_loss(p):
        return touter(tmodel(p, tx))

    t_grad_fn = torch.func.grad(t_loss)

    rng = np.random.default_rng(seed + 5)
    for _ in range(3):
        v = rng.standard_normal(ravel.dim)
        tv = _t_unravel(torch.tensor(v, dtype=torch.float64), tp)
        _, t_hv = torch.func.jvp(t_grad_fn, (tp,), (tv,))
        np.testing.assert_allclose(
            np.asarray(j_hvp(jnp.asarray(v))),
            _t_ravel(t_hv).detach().numpy(),
            atol=1e-11,
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_two_step_trajectory_parity(seed):
    """Two full HF steps (GGN + LM damping + backtracking + line search):
    the jitted on-device pipeline must track the independent torch/NumPy
    replica of the reference algorithm."""
    Ws, bs, x, y = _make_problem(seed)
    params, model_fn, mse, batch = _jax_setup(Ws, bs, x, y)
    tp, tmodel, touter, tx = _torch_setup(Ws, bs, x, y)

    config = HFConfig(damping=0.1, cg_max_iter=30)
    fns = HFModelFns(model_fn=model_fn, loss_outer=mse)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)

    state = init_state(ravel, config)
    x0 = np.zeros(ravel.dim)
    damping = 0.1
    p = params
    for i in range(2):
        p, state, stats = step(p, state, batch)
        tp, x0, damping, t_init, t_final = _np_hf_step(
            tp, tmodel, touter, tx, x0, damping
        )
        np.testing.assert_allclose(float(stats.init_loss), t_init, rtol=1e-9)
        np.testing.assert_allclose(
            float(stats.final_loss), t_final, rtol=1e-7
        )
        np.testing.assert_allclose(
            float(state.damping), damping, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ravel.ravel(p)), _t_ravel(tp).detach().numpy(), atol=1e-7
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_preconditioned_trajectory_parity(seed):
    """Three PRECONDITIONED HF steps (empirical-Fisher diag each step): the
    on-device pipeline must track the torch/NumPy replica through the
    warm-start + damping interplay.  Capped at 3 steps: the warm-start
    feedback amplifies last-bit fp differences geometrically (measured
    3.5e-8 -> 4.8e-5 over 5 steps), while the damping DECISIONS stay in
    exact lockstep throughout."""
    Ws, bs, x, y = _make_problem(seed)
    params, model_fn, mse, batch = _jax_setup(Ws, bs, x, y)
    tp, tmodel, touter, tx = _torch_setup(Ws, bs, x, y)

    from pytorchhessianfree_tpu import diag_EF

    config = HFConfig(damping=0.1, cg_max_iter=30)
    fns = HFModelFns(model_fn=model_fn, loss_outer=mse)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)

    ty = torch.tensor(y, dtype=torch.float64)

    def torch_diag_ef(tp):
        def per_sample_loss(p, xi, yi):
            return torch.mean((tmodel(p, xi.unsqueeze(0)) - yi.unsqueeze(0)) ** 2)

        g = torch.func.vmap(
            torch.func.grad(per_sample_loss), in_dims=(None, 0, 0)
        )(tp, tx, ty)
        n = tx.shape[0]
        flat = torch.stack(
            [torch.cat([g[k][i].reshape(-1) for k in KEYS]) for i in range(n)]
        )
        return (flat**2).sum(0).div(n).detach().numpy()

    state = init_state(ravel, config)
    x0 = np.zeros(ravel.dim)
    damping = 0.1
    p = params
    for i in range(3):
        j_diag = np.asarray(
            diag_EF(model_fn, mse, p, batch[0], batch[1], "mean", ravel)
        )
        t_diag = torch_diag_ef(tp)
        # exact at step 0 (measured 1e-16); later steps compare diagonals of
        # slightly-diverged parameter trajectories (atol follows the 1e-6
        # trajectory tolerance below)
        np.testing.assert_allclose(j_diag, t_diag, rtol=1e-4, atol=1e-6)

        p, state, stats = step(p, state, batch, precond_diag=jnp.asarray(j_diag))
        tp, x0, damping, t_init, t_final = _np_hf_step(
            tp, tmodel, touter, tx, x0, damping, precond_diag=t_diag
        )
        # fp drift between the two implementations compounds geometrically
        # across steps (warm-start feedback); per-step tolerances bound that
        # growth while the damping DECISIONS (discrete x1.5 / x2/3 choices)
        # must stay exactly in lockstep
        loss_rtol = [1e-9, 1e-6, 1e-4][i]
        param_atol = [1e-6, 1e-5, 1e-3][i]
        np.testing.assert_allclose(
            float(stats.init_loss), t_init, rtol=loss_rtol
        )
        np.testing.assert_allclose(
            float(state.damping), damping, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ravel.ravel(p)), _t_ravel(tp).detach().numpy(),
            atol=param_atol, rtol=1e-3,
        )


@pytest.mark.parametrize("seed", [0, 1])
def test_l2_regularized_trajectory_parity(seed):
    """Two full HF steps with L2 weight decay (the reference's flagship
    All-CNN-C configuration, examples/example_utils.py:76-81): the rebuild's
    loss_reg split-form hook must track the torch/NumPy replica in which the
    regularizer rides every loss/gradient evaluation while the GGN flows
    through the outputs only."""
    COEFF = 5e-3
    Ws, bs, x, y = _make_problem(seed)
    params, model_fn, mse, batch = _jax_setup(Ws, bs, x, y)
    tp, tmodel, touter, tx = _torch_setup(Ws, bs, x, y)

    def j_reg(p):
        return 0.5 * COEFF * sum(
            jnp.sum(q**2) for q in jax.tree_util.tree_leaves(p)
        )

    def t_reg(p):
        return 0.5 * COEFF * sum(torch.sum(p[k] ** 2) for k in KEYS)

    config = HFConfig(damping=0.1, cg_max_iter=30)
    fns = HFModelFns(model_fn=model_fn, loss_outer=mse, loss_reg=j_reg)
    ravel = TrainableRavel(params)
    step = make_hf_step(fns, config, ravel)

    state = init_state(ravel, config)
    x0 = np.zeros(ravel.dim)
    damping = 0.1
    p = params
    for i in range(2):
        p, state, stats = step(p, state, batch)
        tp, x0, damping, t_init, t_final = _np_hf_step(
            tp, tmodel, touter, tx, x0, damping, reg=t_reg
        )
        # step 1 compares identical inputs; step 2 compares losses at
        # parameters that already drifted by the step-1 atol
        np.testing.assert_allclose(
            float(stats.init_loss), t_init, rtol=[1e-9, 1e-7][i]
        )
        np.testing.assert_allclose(
            float(stats.final_loss), t_final, rtol=1e-6
        )
        np.testing.assert_allclose(
            float(state.damping), damping, rtol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(ravel.ravel(p)), _t_ravel(tp).detach().numpy(),
            atol=1e-7,
        )
