"""Utilities: flat-vector <-> pytree conversion, solver sizing."""

from .flatten import TrainableRavel
from .memory import format_solver_memory, solver_memory_bytes

__all__ = [
    "TrainableRavel",
    "format_solver_memory",
    "solver_memory_bytes",
]
