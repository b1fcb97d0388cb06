"""Flat-vector <-> parameter-pytree conversion with a trainable mask.

TPU-native replacement for the reference's parameter-vector utilities
(reference hessianfree/utils.py:8-76 and
``torch.nn.utils.convert_parameters.parameters_to_vector``).  The CG solver,
preconditioner and line search all operate on a single flat vector spanning
only the *trainable* parameters; frozen parameters (the analog of
``requires_grad == False``, reference optimizer.py:122, utils.py:29-33) are
kept constant and receive zero tangents.

Everything here is shape-static and jit-traceable: a :class:`TrainableRavel`
is built once per parameter structure on the host, then its methods are pure
functions of arrays.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class TrainableRavel:
    """Ravel/unravel the trainable subset of a parameter pytree.

    Args:
        params: Template parameter pytree (array leaves define shapes/dtypes).
        trainable: Optional pytree of booleans with the same structure (or a
            prefix thereof, broadcast per-leaf like ``requires_grad`` per
            tensor).  ``None`` marks every leaf trainable.
        pad_to_multiple: Optionally round the flat dimension up to a multiple
            (e.g. 1024 = 8 sublanes x 128 lanes of f32) and zero-pad every
            raveled vector to it.  The whole CG vector space then consists of
            lane-aligned vectors whose tail is provably zero (linear solver
            updates, preconditioning with a zero-padded diagonal and dot
            products all preserve/ignore it).  Measured on a v5e with
            ResNet-18 (11.18M params): the aligned space compiles the full
            HF step 7x faster (230 s -> 31.5 s) and runs it 33% faster
            (183 -> 123 ms/step) with identical numerics -- XLA's loop
            layout assignment fights unaligned whole-model vectors.
            ``unravel``/``add``/``write`` simply ignore the tail.
    """

    def __init__(
        self,
        params: Any,
        trainable: Optional[Any] = None,
        pad_to_multiple: Optional[int] = None,
    ):
        leaves, treedef = jax.tree_util.tree_flatten(params)
        self._treedef = treedef
        self._shapes = [jnp.shape(leaf) for leaf in leaves]
        self._dtypes = [jnp.result_type(leaf) for leaf in leaves]

        if trainable is None:
            mask = [True] * len(leaves)
        else:
            mask_leaves = jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(bool, trainable)
            )
            if len(mask_leaves) != len(leaves):
                raise ValueError(
                    "Trainable mask must have one boolean per parameter "
                    f"leaf: got {len(mask_leaves)} for {len(leaves)} leaves."
                )
            mask = [bool(m) for m in mask_leaves]
        self._mask = mask

        sizes = [int(np.prod(s)) if m else 0 for s, m in zip(self._shapes, mask)]
        offsets = np.cumsum([0] + sizes)
        self._offsets = offsets
        self.unpadded_dim = int(offsets[-1])
        if self.unpadded_dim == 0:
            raise ValueError("No trainable parameters.")
        if pad_to_multiple is not None:
            if pad_to_multiple < 1:
                raise ValueError(f"Invalid pad_to_multiple {pad_to_multiple}")
            self.dim = -(-self.unpadded_dim // pad_to_multiple) * pad_to_multiple
        else:
            self.dim = self.unpadded_dim
        self._pad = self.dim - self.unpadded_dim
        # All trainable leaves are promoted to a common dtype in the flat
        # vector (the reference concatenates tensors of one dtype anyway).
        train_dtypes = [d for d, m in zip(self._dtypes, mask) if m]
        self.dtype = jnp.result_type(*train_dtypes)

    # -- pytree -> vector --------------------------------------------------
    def ravel(self, tree: Any) -> jax.Array:
        """Concatenate the trainable leaves of ``tree`` into a flat vector.

        Analog of ``parameters_to_vector`` restricted to trainable params
        (reference optimizer.py:234, :288).
        """
        leaves = jax.tree_util.tree_leaves(tree)
        self._check_leaves(leaves)
        parts = [
            jnp.ravel(leaf).astype(self.dtype)
            for leaf, m in zip(leaves, self._mask)
            if m
        ]
        if self._pad:
            parts.append(jnp.zeros((self._pad,), self.dtype))
        return jnp.concatenate(parts) if len(parts) > 1 else parts[0]

    def _check_leaves(self, leaves):
        if len(leaves) != len(self._mask):
            raise ValueError(
                f"Pytree has {len(leaves)} leaves; this TrainableRavel was "
                f"built for {len(self._mask)}."
            )

    # -- vector -> pytree --------------------------------------------------
    def _check_len(self, vec: jax.Array):
        if vec.ndim != 1 or vec.shape[0] != self.dim:
            # The reference merely warns on length mismatch
            # (reference utils.py:37-38); under jit shapes are static so we
            # can afford a hard error at trace time.
            raise ValueError(
                f"Expected a flat vector of length {self.dim}, got shape "
                f"{vec.shape}."
            )

    def unravel(self, vec: jax.Array) -> Any:
        """Vector -> pytree whose frozen leaves are zeros (a tangent pytree).

        Analog of ``vector_to_parameter_list`` (reference utils.py:41-76)
        extended with zero entries for frozen leaves so the result is a valid
        tangent for ``jax.jvp``.

        The 1-D slices pass through ``lax.optimization_barrier`` (an exact
        identity) BEFORE being reshaped to leaf shape, for two measured
        XLA:TPU reasons:

        - without any barrier, the flat-vector slices fuse into the consumer
          graph, and when that consumer is the forward-mode tangent of a
          conv net the fusion blows compile time up ~25x (measured 125 s
          vs 5.8 s for ResNet-18's jvp, benchmarks/compile_probe5.py);
        - with the barrier placed AFTER the reshape, XLA's reshape-mover
          rewrites ``reshape(slice(vec))`` into ``slice(reshape(vec))``
          whenever a leaf's minor dim divides the flat dim -- manufacturing
          a full-vector ``f32[dim/k, k]`` array whose ``T(8,128)`` tiling
          pads a narrow ``k`` up to 128 lanes.  For an MLP with a 16-wide
          output layer that is an 8x HBM expansion of the *entire* vector
          (3.0 GB per copy at 100M params; XLA remat kept three alive and a
          ~1.6 GB-unpadded step program OOMed a 16 GB v5e,
          benchmarks/memory_audit.py mlp_100m).  Barriering the 1-D slice
          keeps the reshape un-hoistable and the big vector lane-major.
        """
        self._check_len(vec)
        slices = self._barriered_slices(vec)
        out, it = [], iter(slices)
        for shape, dtype, m in zip(self._shapes, self._dtypes, self._mask):
            if m:
                out.append(jnp.reshape(next(it), shape).astype(dtype))
            else:
                out.append(jnp.zeros(shape, dtype))
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def write(self, params: Any, vec: jax.Array) -> Any:
        """Replace trainable leaves of ``params`` with slices of ``vec``.

        Functional analog of ``vector_to_trainparams``
        (reference utils.py:8-38): frozen leaves pass through unchanged.
        """
        self._check_len(vec)
        leaves = jax.tree_util.tree_leaves(params)
        self._check_leaves(leaves)
        slices = self._barriered_slices(vec)
        out, it = [], iter(slices)
        for idx, (leaf, m) in enumerate(zip(leaves, self._mask)):
            if m:
                out.append(
                    jnp.reshape(next(it), self._shapes[idx])
                    .astype(self._dtypes[idx])
                )
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def _barriered_slices(self, vec: jax.Array):
        """1-D trainable-leaf spans of ``vec`` behind an optimization
        barrier (see :meth:`unravel` for the two XLA:TPU reasons)."""
        slices = []
        for i, (shape, m) in enumerate(zip(self._shapes, self._mask)):
            if m:
                size = int(np.prod(shape))
                start = self._offsets[i]
                slices.append(vec[start : start + size])
        return list(jax.lax.optimization_barrier(tuple(slices)))

    def add(self, params: Any, vec: jax.Array) -> Any:
        """Return ``params + unravel(vec)`` -- the trial-parameter write the
        reference performs in-place (reference optimizer.py:290-294, :349-350)
        done functionally.  Output passes through an optimization barrier
        for the same compile-time reason as :meth:`unravel` (trial parameter
        leaves otherwise fuse flat-vector slices into the model's convs)."""
        self._check_len(vec)
        leaves = jax.tree_util.tree_leaves(params)
        self._check_leaves(leaves)
        slices = self._barriered_slices(vec)
        out, it = [], iter(slices)
        for idx, (leaf, m) in enumerate(zip(leaves, self._mask)):
            if m:
                delta = jnp.reshape(next(it), self._shapes[idx]).astype(
                    self._dtypes[idx]
                )
                out.append(leaf + delta)
            else:
                out.append(leaf)
        return jax.tree_util.tree_unflatten(self._treedef, out)

    def zeros(self) -> jax.Array:
        """A zero flat vector of the trainable dimension."""
        return jnp.zeros((self.dim,), self.dtype)
