"""Small NN with empirical-Fisher preconditioning and optimizer-state
inspection (the analog of reference examples/run_small_nn.py, which also
demonstrates reading the state_dict)."""

import jax
from example_utils import force_cpu_if_requested, get_small_nn_problem, report

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import mlp_apply, mse_loss

if __name__ == "__main__":
    print(f"Running small NN on {jax.devices()[0].platform}")
    key = jax.random.PRNGKey(0)
    params, _ = get_small_nn_problem(key)
    opt = HessianFree(
        params, model_fn=mlp_apply, loss_outer=mse_loss, damping=0.1
    )

    for step_idx in range(3):
        key, kb = jax.random.split(key)
        _, batch = get_small_nn_problem(kb)
        # Martens' (D + damping)^(-0.75) empirical-Fisher preconditioner,
        # rebuilt per step on the current batch.
        diag = opt.get_preconditioner(*batch, reduction="mean")
        opt.step(batch, precond_diag=diag)
        report(step_idx, opt)

    # Inspect the optimizer state (reference examples/run_small_nn.py:46-52).
    sd = opt.state_dict()
    print("\nstate_dict:")
    print("  step_count   =", sd["step_count"])
    print("  damping      =", float(sd["state"]["damping"]))
    print("  x0 norm      =", float(jax.numpy.linalg.norm(sd["state"]["x0"])))
    for k, v in sd["history"].items():
        print(f"  {k:15s} = {v}")
