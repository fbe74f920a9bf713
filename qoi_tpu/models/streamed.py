"""Streamed single-device encode for huge images (SURVEY §7.5.6).

The reference caps streams at 400M pixels (qoi.h:329-332) — ~1.6 GB of
RGBA input and up to 2 GB of output, too large for the all-at-once
pipeline's intermediates on one chip. Here the stream is processed as a
sequence of fixed-size tiles on one device, chaining the four encoder
carries (EncoderCarry: boundary pixel, pending-run phase, 64-slot table)
through the same plumbing the multi-chip tiled path uses — one compiled
program regardless of image size, O(tile) device memory, byte-identical
output.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import format as fmt
from ..ops import compact
from . import pipeline


@jax.jit
def _tile_step(px4, n_valid, contains_last, carry: pipeline.EncoderCarry):
    chunks = pipeline.encode_stage_chunks(
        px4, n_valid,
        prev_in=carry.prev_px, run_in=carry.run,
        table_in=(carry.table, carry.written),
        contains_last=contains_last,
    )
    buf, total = compact.compact_bytes6(
        chunks.staging, chunks.lens, px4.shape[0] * 6)
    return buf, total, chunks.carry


def encode(pixels: np.ndarray, desc: fmt.StreamDesc,
           tile_px: int = 1 << 22) -> bytes:
    """Encode one image of any size the format allows; byte-identical to the
    reference encoder (qoi.h:356). Device memory stays O(tile_px)."""
    desc.validate()
    px4 = pipeline.force_rgba(pixels, desc)
    n = px4.shape[0]
    t = min(tile_px, pipeline.bucket_size(n))
    n_tiles = -(-n // t)

    carry = pipeline.EncoderCarry.seed()
    parts = []
    for k in range(n_tiles):
        lo = k * t
        chunk = px4[lo: lo + t]
        n_valid = chunk.shape[0]
        if n_valid < t:
            chunk = np.concatenate(
                [chunk, np.zeros((t - n_valid, 4), np.uint8)])
        buf, total, carry = _tile_step(
            jnp.asarray(chunk), jnp.int32(n_valid),
            jnp.bool_(k == n_tiles - 1), carry)
        parts.append(np.asarray(jax.device_get(buf))[: int(jax.device_get(total))])
    return fmt.pack_header(desc) + b"".join(p.tobytes() for p in parts) + fmt.TRAILER
