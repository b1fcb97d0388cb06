"""Parallelism: device meshes and data-parallel optimizer steps."""
