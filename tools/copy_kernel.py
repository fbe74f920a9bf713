"""Pallas HBM materialization barrier (identity copy) — NEGATIVE RESULT.

Measured a dead end on hardware and kept only for tools/abperf.py's
`barrier` A/B variants (it is NOT a production kernel — hence its home
under tools/): routing the encoder's staging through this barrier costs
+455 ms per 8 frames (PERF_NOTES.md round-2 "HBM-copy barrier is a dead
end") — the round-2 "compact is ~5 ms from materialized staging" reading
that motivated it was a u8->i32 relayout artifact.

Original idea: `lax.optimization_barrier` does not stop XLA from
fusing/rematerializing a producer into its consumers; a Pallas custom
call does — its operand must be fully materialized in HBM. The copy
itself would be pure HBM bandwidth (~50 MB at ~800 GB/s = ~0.13 ms),
but the relayouts around it are brutally slow.
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
