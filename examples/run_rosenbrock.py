"""Minimize the 2-D Rosenbrock function with Hessian curvature
(the analog of reference examples/run_rosenbrock.py)."""

import jax
import numpy as np
from example_utils import force_cpu_if_requested, report

force_cpu_if_requested()

from pytorchhessianfree_tpu import HessianFree
from pytorchhessianfree_tpu.models import rosenbrock_problem

if __name__ == "__main__":
    print(f"Running Rosenbrock on {jax.devices()[0].platform}")
    params, fns = rosenbrock_problem(init=(-0.5, 1.5))
    opt = HessianFree(
        params,
        loss_fn=fns.loss_fn,
        curvature_opt="hessian",  # the true Hessian of the target function
        damping=0.5,
        cg_max_iter=50,
    )
    for step_idx in range(20):
        opt.step(None)
        report(step_idx, opt)

    final = np.asarray(opt.params["x"])
    print(f"\nfinal params = {final}  (minimum is [1, 1])")
    assert np.allclose(final, [1.0, 1.0], atol=1e-3), "did not converge"
    print("converged.")
