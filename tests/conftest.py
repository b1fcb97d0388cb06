"""Test configuration: run on a virtual 8-device CPU mesh with f64 enabled.

The reference parametrizes its tests over cpu (+ cuda when available,
reference tests/test_cg.py:24-27); the TPU-native analog is a virtual
multi-device CPU platform (``xla_force_host_platform_device_count``) so the
data-parallel sharding paths are exercised without TPU hardware.  f64 is
enabled because several oracles need it (e.g. the M = A^{-1} one-iteration
CG test, reference tests/test_cg.py:162-224 uses torch.double).

Note: a sitecustomize hook may pre-import jax and pin a remote-TPU platform
regardless of the JAX_PLATFORMS env var, so the CPU platform and the virtual
device count are forced through jax.config / XLA_FLAGS *after* import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# ---------------------------------------------------------------------------
# smoke subset: a <2-minute representative slice of the ~16-minute suite
# (one entry per layer: flatten/select/cg/curvature/optimizer/acc/flags/
# loader).  `python -m pytest -m smoke` is the fast contributor loop;
# CI and pre_commit_checks still run everything.
# ---------------------------------------------------------------------------

_SMOKE = (
    "test_flatten.py",              # whole file: ravel/unravel + padded space
    "test_select.py",               # whole file: backtracking + line search
    "test_cg.py::test_cg_residuals",
    "test_curvature.py::test_ggnvp_matches_dense_ggn",
    "test_optimizer.py::test_on_quadratic_one_newton_step",
    "test_optimizer.py::test_step_with_tiny_cg_budget",
    "test_optimizer_acc.py::test_acc_reduce_weighting",
    "test_stats_flags.py::test_nonpos_curvature_flag_through_step",
    "test_runtime_loader.py::test_device_prefetcher_error_propagates",
    "test_interop.py::test_flax_fns_batchnorm_state_frozen",
    "test_moe.py::test_moe_ffn_matches_per_token_oracle",
    "test_bench_protocol.py::test_forced_outage_emits_stale_json_rc0",
    "test_roofline_accounting.py",  # whole file: fast cost-analysis pins
)


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        fname = item.path.name if hasattr(item, "path") else ""
        for pat in _SMOKE:
            if "::" in pat:
                f, name = pat.split("::")
                if fname == f and item.originalname == name:
                    item.add_marker(pytest.mark.smoke)
                    break
            elif fname == pat:
                item.add_marker(pytest.mark.smoke)
                break
