"""Batched encode/decode: many independent streams per device (DP axis).

BASELINE configs 3 and 5: each image is its own seed-state stream (exactly
a standalone reference-compatible file), so there is no cross-stream carry —
the batch axis is embarrassingly parallel and maps onto `vmap` within a chip
and the "data" mesh axis across chips (qoi_tpu/parallel/sharding.py).

Shape bucketing keeps the number of compiled programs O(log max-size):
images are grouped by their power-of-two pixel bucket, stacked, and run as
one vmapped call per group (per-image true sizes stay dynamic `n_valid`
operands). Invalid inputs are flagged per-image and the batch continues
(SURVEY §5.3: failure detection without elastic recovery).
"""
from __future__ import annotations

import collections
import functools
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import format as fmt
from ..ops import compact
from . import decode_pipeline, decode_v3, pipeline


@jax.jit
def _encode_batch_phase_a(px4: jnp.ndarray, n_valid: jnp.ndarray):
    return jax.vmap(pipeline._encode_phase_a)(px4, n_valid)


@functools.partial(jax.jit, static_argnames=("capacity",))
def _encode_batch_phase_b(px4, n_valid, local, capacity: int):
    def one(px, n, loc):
        chunks = pipeline.encode_stage_chunks(px, n, table_local=loc)
        return compact.compact_bytes6(chunks.staging, chunks.lens, capacity)

    return jax.vmap(one, in_axes=(0, 0, 0))(px4, n_valid, local)


def _encode_batch_device(px4: jnp.ndarray, n_valid: jnp.ndarray, capacity: int):
    # two-program flow (PERF_NOTES.md: monolith stalls the remote compiler)
    local = _encode_batch_phase_a(px4, n_valid)
    return _encode_batch_phase_b(px4, n_valid, local, capacity)


def encode_batch(
    images: Sequence[np.ndarray],
    descs: Optional[Sequence[fmt.StreamDesc]] = None,
) -> List[bytes]:
    """Encode a batch of images (each (h, w, 3|4) uint8); returns one
    reference-compatible stream per image, byte-identical to encoding each
    alone."""
    if descs is None:
        descs = [
            fmt.StreamDesc(im.shape[1], im.shape[0], im.shape[2])
            for im in images
        ]
    groups: Dict[int, List[int]] = collections.defaultdict(list)
    for i, d in enumerate(descs):
        d.validate()
        groups[pipeline.bucket_size(d.num_pixels)].append(i)

    out: List[bytes] = [b""] * len(images)
    for bucket, idxs in sorted(groups.items()):
        px = np.zeros((len(idxs), bucket, 4), np.uint8)
        nv = np.zeros((len(idxs),), np.int32)
        for row, i in enumerate(idxs):
            flat = pipeline.force_rgba(images[i], descs[i])
            px[row, : flat.shape[0]] = flat
            nv[row] = flat.shape[0]
        if jax.devices()[0].platform == "tpu":
            # per-image pipelined dispatch of the fused word-sum program
            # (the fastest measured structure, PERF_NOTES r3), synced
            # with ONE combined totals fetch; each stream's words are
            # then fetched in fixed-shape pieces (only ~total bytes move
            # through the ~3 MB/s host link)
            from ..utils import fetch

            devouts = [
                pipeline.encode_device_wordsum(
                    jnp.asarray(px[row]), jnp.int32(nv[row]))
                for row in range(len(idxs))
            ]
            comb = jax.jit(lambda ts: jnp.stack(ts))
            tots = np.asarray(jax.device_get(
                comb([t for _, t in devouts])))
            for row, i in enumerate(idxs):
                words, _ = devouts[row]
                body = fetch.fetch_prefix(
                    words, -(-int(tots[row]) // 4)).view(np.uint8)
                out[i] = (
                    fmt.pack_header(descs[i])
                    + body[: int(tots[row])].tobytes()
                    + fmt.TRAILER
                )
            continue
        bufs, totals = _encode_batch_device(
            jnp.asarray(px), jnp.asarray(nv), bucket * 6)
        bufs = np.asarray(jax.device_get(bufs))
        totals = np.asarray(jax.device_get(totals))
        for row, i in enumerate(idxs):
            out[i] = (
                fmt.pack_header(descs[i])
                + bufs[row, : totals[row]].tobytes()
                + fmt.TRAILER
            )
    return out


@functools.partial(jax.jit, static_argnames=("n_px_cap",))
def _decode_batch_device(data: jnp.ndarray, chunks_len: jnp.ndarray, n_px_cap: int):
    return jax.vmap(
        lambda d, c: decode_pipeline._decode_chunks(d, c, n_px_cap)
    )(data, chunks_len)


def decode_batch(
    streams: Sequence[bytes], channels: int = 0
) -> List[Tuple[Optional[np.ndarray], Optional[fmt.StreamDesc], Optional[str]]]:
    """Decode a batch of QOI streams. Returns per-stream
    (pixels, desc, error): invalid streams get (None, None, message) and the
    rest of the batch proceeds (SURVEY §5.3)."""
    if channels not in (0, 3, 4):
        raise ValueError(f"channels must be 0, 3 or 4, got {channels}")

    parsed: List[Optional[fmt.StreamDesc]] = []
    errors: List[Optional[str]] = []
    for s in streams:
        try:
            parsed.append(fmt.unpack_header(s))
            errors.append(None)
        except ValueError as e:
            parsed.append(None)
            errors.append(str(e))

    groups: Dict[Tuple[int, int], List[int]] = collections.defaultdict(list)
    for i, d in enumerate(parsed):
        if d is None:
            continue
        cap = decode_pipeline.bucket_size_fine(
            len(streams[i]) - fmt.HEADER_SIZE)
        npc = decode_pipeline.bucket_size(d.num_pixels)
        groups[(cap, npc)].append(i)

    results: List[Tuple] = [(None, None, e) for e in errors]
    for (cap, npc), idxs in sorted(groups.items()):
        data = np.zeros((len(idxs), cap), np.uint8)
        clens = np.zeros((len(idxs),), np.int32)
        for row, i in enumerate(idxs):
            body = np.frombuffer(streams[i], np.uint8)[fmt.HEADER_SIZE:]
            data[row, : body.shape[0]] = body
            clens[row] = len(streams[i]) - fmt.HEADER_SIZE - fmt.TRAILER_SIZE
        px32, conv = decode_v3.decode_group(
            jnp.asarray(data), jnp.asarray(clens), npc)
        px32 = np.asarray(jax.device_get(px32))  # (B, npc) packed u32
        conv = np.asarray(jax.device_get(conv))  # (B,) per-stream
        for row, i in enumerate(idxs):
            d = parsed[i]
            out_ch = channels if channels else d.channels
            if conv[row]:
                img = decode_v3.unpack_px32(px32[row])[
                    : d.num_pixels, :out_ch].reshape(
                    d.height, d.width, out_ch)
            else:  # adversarial stream: certified fallback
                img, _ = decode_pipeline.decode(streams[i], channels)
            results[i] = (img, d, None)
    return results
