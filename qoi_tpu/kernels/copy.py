"""Pallas HBM materialization barrier (identity copy).

`lax.optimization_barrier` does not stop XLA from fusing/rematerializing
a producer into its consumers; a Pallas custom call does — its operand
must be fully materialized in HBM. PERF_NOTES.md measured the encoder's
compaction at ~61 ms when fused in the same program as the staging
stages but ~5 ms from a materialized staging buffer; this kernel lets
one program get the materialized behavior without paying a second
~30-40 ms program dispatch (program floors are device-serial on this
platform).

The copy itself is pure HBM bandwidth: ~50 MB of staging at ~800 GB/s
is ~0.13 ms.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANES = 1024
_ROWS = 8


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def hbm_copy(x, interpret: bool = False):
    """Identity copy of any array through a Pallas kernel; the input is
    forced to materialize in HBM. Shape/dtype preserved."""
    shape = x.shape
    if x.dtype == jnp.uint8:
        # pack to words: Mosaic's i8 path is fragile (PERF_NOTES); the
        # bitcasts are free elementwise views around the copy
        assert x.size % 4 == 0
        w = jax.lax.bitcast_convert_type(x.reshape(-1, 4), jnp.int32)
        w = hbm_copy(w, interpret=interpret)
        return jax.lax.bitcast_convert_type(
            w.reshape(-1, 4)[:, None, :], jnp.uint8).reshape(shape)

    flat = x.reshape(-1)
    blk = _ROWS * _LANES
    n = flat.shape[0]
    npad = -(-n // blk) * blk
    if npad != n:
        flat = jnp.concatenate(
            [flat, jnp.zeros((npad - n,), flat.dtype)])
    rows = flat.reshape(-1, _LANES)
    out = pl.pallas_call(
        _copy_kernel,
        grid=(rows.shape[0] // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(rows.shape, rows.dtype),
        interpret=interpret,
    )(rows)
    return out.reshape(-1)[:n].reshape(shape)
