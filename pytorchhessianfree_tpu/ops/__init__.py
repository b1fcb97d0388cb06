"""Compute-path ops: CG solver, curvature matvecs, preconditioners, step
selection, spectral diagnostics (Lanczos/SLQ)."""
