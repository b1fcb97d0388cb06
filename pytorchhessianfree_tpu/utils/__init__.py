"""Utilities: flat-vector <-> pytree conversion with trainable masks."""

from .flatten import TrainableRavel

__all__ = ["TrainableRavel"]
