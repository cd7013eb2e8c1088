"""Shared helpers for the Pallas kernels."""

import jax


def out_struct(shape, dtype, like):
    """ShapeDtypeStruct for a pallas_call output, inheriting `like`'s vma.

    Inside jax.shard_map (check_vma=True, the default) every pallas_call
    output must declare which mesh axes it varies over; a plain
    ShapeDtypeStruct(vma=None) is rejected at trace time.  The kernels'
    outputs always vary over exactly the axes their inputs do (they are
    per-shard elementwise/blocked transforms), so the input's vma is the
    correct declaration.  Outside shard_map typeof(like).vma is empty and
    the plain struct is used.
    """
    vma = getattr(jax.typeof(like), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)
