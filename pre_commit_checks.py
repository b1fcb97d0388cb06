"""Local pre-commit gate: run the test suite, then every example on CPU.

Analog of the reference's pre-commit script (reference
pre_commit_checks.py:18-41), which runs pytest, the formatters and all
example scripts.  Formatters are invoked only if installed (this environment
is hermetic).
"""

import shutil
import subprocess
import sys

STEPS = [
    [sys.executable, "-m", "pytest", "tests/", "-q"],
    [sys.executable, "examples/run_rosenbrock.py", "--cpu"],
    [sys.executable, "examples/run_mwe.py", "--cpu"],
    [sys.executable, "examples/run_small_nn.py", "--cpu"],
    [sys.executable, "examples/run_small_nn_acc.py", "--cpu"],
    [sys.executable, "examples/run_spectrum.py", "--cpu"],
    [sys.executable, "examples/run_nystrom.py", "--cpu"],
    [sys.executable, "examples/run_sharded.py", "--cpu"],
    [sys.executable, "examples/run_transformer.py", "--cpu"],
    [sys.executable, "examples/run_decoder_lm.py", "--cpu"],
    [sys.executable, "examples/run_flax_interop.py", "--cpu"],
    [sys.executable, "examples/run_context_parallel.py", "--cpu"],
    [sys.executable, "examples/run_moe_lm.py", "--cpu"],
    [sys.executable, "examples/run_moe_lm.py", "--cpu", "--ep"],
    [sys.executable, "examples/run_pipeline_parallel.py", "--cpu"],
    [sys.executable, "examples/run_pipeline.py", "--cpu"],
    [sys.executable, "examples/run_prefetch_loader.py", "--cpu"],
    [sys.executable, "examples/run_train_loop.py", "--cpu"],
    [sys.executable, "examples/run_resnet18_mnist.py", "--cpu", "--tiny"],
    [sys.executable, "examples/run_allcnnc_cifar100.py", "--cpu", "--tiny"],
]

# Fast inner loop while iterating (not a substitute for the full gate):
#   python -m pytest -m smoke -q        (~1 min representative subset)

OPTIONAL = [
    ["black", "--check", "pytorchhessianfree_tpu", "tests", "examples"],
    ["isort", "--check-only", "pytorchhessianfree_tpu", "tests", "examples"],
]


def main() -> int:
    for cmd in STEPS:
        print(f"\n>>> {' '.join(cmd)}")
        if subprocess.run(cmd).returncode != 0:
            print("FAILED")
            return 1
    for cmd in OPTIONAL:
        if shutil.which(cmd[0]) is None:
            print(f"(skipping {cmd[0]}: not installed)")
            continue
        print(f"\n>>> {' '.join(cmd)}")
        if subprocess.run(cmd).returncode != 0:
            print("FAILED")
            return 1
    print("\nAll pre-commit checks passed.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
