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
           tile_px: int = 0, config=None) -> bytes:
    """Encode one image of any size the format allows; byte-identical to the
    reference encoder (qoi.h:356). Device memory stays O(tile_px); the tile
    size comes from `tile_px` if nonzero, else `config.stream_tile_px`."""
    if not tile_px:
        tile_px = config.stream_tile_px if config else 1 << 22
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


# ---------------------------------------------------------------------------
# Streamed single-device DECODE for huge images (the reference caps at
# 400M px / ~2 GB streams, qoi.h:329-332 — too large for the all-at-once
# decoder's per-byte int32 intermediates on one chip).
#
# The byte stream is processed as fixed-size tiles ending exactly at chunk
# boundaries (the FSM state at position T-8 says how far the straddling
# chunk extends, ops/fsm.py). Each tile runs the blocked symbolic decoder
# (models/decode_v3.py) with the incoming 65-entry state (px + 64-slot
# table, packed u32) and hands its exit state to the next tile; run
# expansion happens per tile with the tile's entry px as the telescoping
# seed. Non-converging tiles fall back to the sequential scan anchor with
# the same entry state — the decode ladder, tile-local.
# ---------------------------------------------------------------------------

_LOOKBEHIND = 8  # tile stride = tile_bytes - 8; a chunk is at most 5 bytes


@functools.partial(jax.jit, static_argnames=("max_rounds",))
def _decode_tile(data_t, remaining, entry65, max_rounds: int = 12):
    """One byte-tile through the symbolic decoder. data_t: (T,) uint8;
    remaining: traced int32 chunk bytes left in the stream (>= 1).
    Returns (px32 per byte, pix_off, conv, exit65, consumed, n_px_tile)."""
    from .. import format as fmt  # noqa: F401  (kept for parity with encode)
    from ..ops import fsm
    from . import decode_v3 as v3

    t = data_t.shape[0]
    lim = jnp.minimum(remaining, t)
    _, state_before = fsm.chunk_starts_and_state(data_t, lim)
    # end the tile at the chunk boundary at/after T-8: the FSM state there
    # counts the straddling chunk's remaining bytes (<= 4 < _LOOKBEHIND)
    spill = state_before[t - _LOOKBEHIND].astype(jnp.int32)
    consumed = jnp.minimum(t - _LOOKBEHIND + spill, remaining)
    px, starts, npix, pix_off, conv, _, exit65 = v3._decode_core(
        data_t, consumed, max_rounds, entry65)
    n_px_tile = pix_off[-1] + npix[-1]
    return px, pix_off, conv, exit65, consumed, n_px_tile


@functools.partial(jax.jit, static_argnames=("p_cap", "use_kernel"))
def _expand_tile(px, pix_off, entry65, p_cap: int, use_kernel: bool):
    from ..kernels import expand as kexpand

    if use_kernel:
        return kexpand.expand_px(pix_off, px, p_cap, seed32=entry65[0])
    return kexpand.expand_px_xla(pix_off, px, p_cap, seed32=entry65[0])


def _unpack65(entry65: np.ndarray):
    """(65,) packed u32 -> ((4,) u8 px, (64, 4) u8 table)."""
    u8 = np.asarray(entry65, np.uint32).view(np.uint8).reshape(65, 4)
    return u8[0], u8[1:]


def _pack65(px: np.ndarray, table: np.ndarray) -> np.ndarray:
    return np.concatenate([px[None], table]).reshape(65, 4).view(
        np.uint32).reshape(65)


def decode(data: bytes, channels: int = 0, tile_bytes: int = 0,
           max_rounds: int = 0, config=None
           ) -> Tuple[np.ndarray, fmt.StreamDesc]:
    """Decode a stream of any size the format allows; pixel-identical to
    the reference decoder (qoi.h:488), including truncation tolerance and
    channel forcing. Device memory stays O(tile_bytes + tile pixels); tile
    size and fixpoint cap come from `config` (stream_tile_px /
    decode_max_iters) unless given explicitly."""
    from . import decode_pipeline as v1
    from . import scan_codec

    if not tile_bytes:
        tile_bytes = config.stream_tile_px if config else 1 << 22
    if not max_rounds:
        max_rounds = config.decode_max_iters if config else 12
    if channels not in (0, 3, 4):
        raise ValueError(f"channels must be 0, 3 or 4, got {channels}")
    desc = fmt.unpack_header(data)
    out_ch = channels if channels else desc.channels
    n_px = desc.num_pixels

    chunks = np.frombuffer(data, dtype=np.uint8)[fmt.HEADER_SIZE:]
    chunks_len = len(data) - fmt.HEADER_SIZE - fmt.TRAILER_SIZE
    t = max(1024, tile_bytes)

    use_kernel = jax.devices()[0].platform == "tpu"
    entry65 = np.zeros((65,), np.uint32)
    entry65[0] = np.uint32(
        fmt.SEED_PIXEL[0] | fmt.SEED_PIXEL[1] << 8
        | fmt.SEED_PIXEL[2] << 16 | fmt.SEED_PIXEL[3] << 24)
    entry_dev = jnp.asarray(entry65)

    cursor = 0
    parts: list = []
    px_cursor = 0
    while cursor < chunks_len and px_cursor < n_px:
        buf = np.zeros((t,), np.uint8)
        span = chunks[cursor: cursor + t]
        buf[: len(span)] = span
        remaining = chunks_len - cursor

        px, pix_off, conv, exit65, consumed, n_px_tile = _decode_tile(
            jnp.asarray(buf), jnp.int32(remaining), entry_dev,
            max_rounds=max_rounds)
        consumed = int(jax.device_get(consumed))
        n_out = min(int(jax.device_get(n_px_tile)), n_px - px_cursor)

        if bool(jax.device_get(conv)):
            if n_out:
                p_cap = v1.bucket_size(n_out)
                plane = _expand_tile(px, pix_off, entry_dev, p_cap, use_kernel)
                parts.append(np.asarray(jax.device_get(plane))[:n_out])
            entry_dev = exit65
        else:
            # tile-local sequential fallback with the same entry state
            e_px, e_table = _unpack65(np.asarray(jax.device_get(entry_dev)))
            p_cap = v1.bucket_size(max(n_out, 1))
            out4, (f_px, f_table) = scan_codec._decode_scan_entry_jit(
                jnp.asarray(buf), p_cap, jnp.int32(consumed),
                jnp.asarray(e_px), jnp.asarray(e_table))
            if n_out:
                parts.append(np.ascontiguousarray(
                    np.asarray(jax.device_get(out4))[:n_out]).view(
                        np.uint32).reshape(-1))
            entry_dev = jnp.asarray(_pack65(
                np.asarray(jax.device_get(f_px)),
                np.asarray(jax.device_get(f_table))))

        cursor += max(consumed, 1)
        px_cursor += n_out

    flat32 = (np.concatenate(parts) if parts
              else np.zeros((0,), np.uint32))
    if px_cursor < n_px:  # truncated stream: repeat the current px
        fill = np.asarray(jax.device_get(entry_dev))[0]
        flat32 = np.concatenate([
            flat32, np.full((n_px - px_cursor,), np.uint32(fill))])
    px4 = np.ascontiguousarray(flat32).view(np.uint8).reshape(-1, 4)
    img = px4[:n_px, :out_ch].reshape(desc.height, desc.width, out_ch)
    return img, desc
