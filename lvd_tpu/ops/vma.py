"""shard_map vma-legality wrapper for the Pallas kernels.

Under jax >= 0.8, ``shard_map(..., check_vma=True)`` — the default, and
REQUIRED for correct collective transposition of the psum'd guidance energy
(disabling it silently broke the frame-sharded guided pipeline in round 4) —
demands that every ``pl.pallas_call`` declare how its outputs vary across
mesh axes via ``jax.ShapeDtypeStruct(..., vma=...)``.

Every kernel in this package is pure per-shard compute (no cross-device
communication happens inside a kernel; all collectives in the sharded
sampling path are explicit ``psum``/``ppermute``/``all_to_all`` calls in
model/guidance code). The correct output vma is therefore the union of the
operand vmas, and replicated operands (weights, scalars) are ``pcast`` up to
that union first so the call is well-typed. Outside shard_map every vma is
empty and this wrapper degenerates to a plain ``pl.pallas_call``.
"""

from __future__ import annotations

import jax
from jax.experimental import pallas as pl


def _vma_of(x) -> frozenset:
    return jax.typeof(x).vma


def pallas_call(kernel, **kwargs):
    """Drop-in replacement for ``pl.pallas_call(kernel, **kwargs)``.

    Returns a callable over the kernel operands that (1) unions the operand
    vmas, (2) pcasts sub-varying operands up to the union, and (3) rewrites
    every ``out_shape`` ShapeDtypeStruct to carry that union as its vma.
    Identity (modulo the extra Python frame) when no operand is varying.
    """

    def call(*args):
        vma = frozenset()
        for a in args:
            vma |= _vma_of(a)
        if vma:
            args = tuple(
                a
                if _vma_of(a) == vma
                else jax.lax.pcast(
                    a, tuple(sorted(vma - _vma_of(a))), to="varying"
                )
                for a in args
            )
        # ALWAYS annotate, even with an empty union: inside shard_map a
        # kernel whose operands are all replicated (e.g. the cross-attn k/v
        # projections of the replicated text embeddings) still needs an
        # explicit vma=frozenset() — None is rejected. Outside shard_map
        # the empty annotation is inert.
        out_shape = jax.tree_util.tree_map(
            lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, vma=vma),
            kwargs["out_shape"],
        )
        return pl.pallas_call(kernel, **dict(kwargs, out_shape=out_shape))(
            *args
        )

    return call
