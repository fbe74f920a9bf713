"""Strict-mode tiled QOI decode: ONE stream, bytes sharded over "seq".

The sequence-parallel counterpart of parallel/tiled.py for decode
(SURVEY.md §7.3 "cross-tile decode"): each device owns a contiguous byte
range of one stream and the four decoder carries cross shard boundaries as
tiny summaries:

  cursor    — FSM transition maps (5 int8 each), exclusively composed
              across shards -> each shard's entry state marks its chunk
              starts without scanning its neighbours' bytes
  hash      — per-shard (reset?, add) affine maps mod 64, composed the
              same way (+ last-RGBA alpha for the optimistic guess)
  index[64] — last-writer summaries over GLOBAL chunk ids (the same
              overwrite monoid as the encoder's)
  px        — the value recurrence: each local chunk resolves by pointer
              doubling to either a local anchor or one of 65 SYMBOLS
              (incoming pixel, incoming table slot 0..63); per-shard
              symbolic summaries compose in one tiny replicated scan, then
              one local substitution pass finishes — the blockwise
              recurrence-chunking pattern (SURVEY §5.7)

All under one shard_map with a global hash fixpoint (psum-agreed), exactly
mirroring the single-device pipeline's certificate: converged means the
replay used the true hashes, so the output equals the reference decoder's.
Non-convergence falls back to the single-device path on the host.

Run expansion also happens on-device and sharded (`_expand_tiled`):
per-chunk mod-256 SWAR deltas scatter into the global pixel-delta plane,
a reduce-scatter sums them onto each shard's pixel range over ICI, and a
sharded prefix scan rebuilds the pixel values — the chunk->pixel fan-out
(a 1-byte RUN covers up to 62 px) never touches the host.

Collective budget (r5 audit, SURVEY §5.8 "one fused collective per
step"): tokenize+halo ONE all_gather (was gather + ppermute), chunk/
pixel/alpha scalars ONE (was three), per fixpoint round ONE packed
table gather + ONE packed (65, 8) summary gather + the psum'd
certificate (was seven), expansion ONE boundary gather + ONE stacked
reduce_scatter + ONE totals gather (was five-plus). Everything crossing
the mesh is packed i32 words.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import format as fmt
from ..models import decode_pipeline as dp
from ..ops import fsm, link, scans, table
from . import sharding

_SEED = jnp.array(fmt.SEED_PIXEL, dtype=jnp.uint8)
_NSYM = 65  # symbol 0: incoming px; symbols 1..64: incoming table slot s-1
_MAX_ITERS = 12


def _tile_step(data: jnp.ndarray, chunks_len: jnp.ndarray, axis: str):
    """data: (Mb,) local byte shard of the chunk stream (incl. trailer/pad
    in the last shard). Returns per-shard chunk-level decode results."""
    mb = data.shape[0]
    s = jax.lax.axis_size(axis)
    ax = jax.lax.axis_index(axis)
    base_byte = ax * mb
    io = jnp.arange(mb, dtype=jnp.int32)

    # ---- stage 1: tokenize via packed FSM map composition ----------------
    # base-8-packed 5-state maps (ops/fsm.py): one int32 per byte — the
    # (Mb, 5) layout lane-pads 25x on TPU (PERF_NOTES.md)
    lens_b = fsm.chunk_byte_len(data)
    trans = fsm._pack_map(lens_b - 1)
    incl = scans.blocked_scan(fsm._compose_maps, trans)  # (Mb,)
    local_map = incl[-1]
    # fused stage-1 exchange (r5 collective audit): the FSM map AND the
    # 4-byte left-halo (packed into one word) ride ONE all_gather — the
    # halo was a separate ppermute before, and both are local facts
    halo_w = (data[0].astype(jnp.int32) | data[1].astype(jnp.int32) << 8
              | data[2].astype(jnp.int32) << 16
              | data[3].astype(jnp.int32) << 24)
    st1 = jax.lax.all_gather(
        jnp.stack([local_map, halo_w]), axis)                  # (S, 2)
    entry_maps = st1[:, 0]

    def estep(m, x):  # carry: packed map composed so far
        return fsm._compose_maps(m, x), m

    ident = fsm._pack_map(jnp.zeros((), jnp.int32))
    _, excl_maps = jax.lax.scan(estep, ident, entry_maps)
    entry_state = (excl_maps[ax] & 7).astype(jnp.int32)        # digit of state 0
    # state after byte i given the shard's entry state: digit entry_state
    state_after = (incl >> (3 * entry_state)) & 7
    state_before = jnp.concatenate(
        [entry_state[None], state_after[:-1]])
    starts = (state_before == 0) & (base_byte + io < chunks_len)

    # ---- stage 2: local chunk records (halo covers cross-shard chunks) ---
    halo_in = st1[jnp.minimum(ax + 1, s - 1), 1]  # right neighbour's word
    halo_in = jnp.where(ax == s - 1, 0, halo_in)
    halo = jnp.stack([(halo_in >> (8 * k)) & 0xFF
                      for k in range(4)]).astype(jnp.uint8)
    data_ext = jnp.concatenate([data, halo])
    cid = scans.exclusive_cumsum(starts.astype(jnp.int32))
    slot = jnp.where(starts, cid, mb)
    start_pos = jnp.full((mb,), mb - 1, jnp.int32).at[slot].set(io, mode="drop")
    nloc = cid[-1] + starts[-1].astype(jnp.int32)
    valid = io < nloc
    f = dp._chunk_fields(data_ext, start_pos, valid)

    # fused stage-2/3 exchange: chunk count, pixel count and the
    # last-RGBA alpha carry are independent local scalars — ONE gather
    npix_sum = jnp.sum(f["npix"])
    last_rgba_l = scans.cummax(jnp.where(f["is_rgba"], io, -1))
    alpha_fin = jnp.where(last_rgba_l[-1] >= 0,
                          f["b5"][jnp.maximum(last_rgba_l[-1], 0)].astype(jnp.int32), -1)
    st2 = jax.lax.all_gather(
        jnp.stack([nloc, npix_sum, alpha_fin]), axis)        # (S, 3)
    nlocs, npix_sums, alpha_fins = st2[:, 0], st2[:, 1], st2[:, 2]
    gid_base = jnp.sum(jnp.where(jnp.arange(s) < ax, nlocs, 0))
    pix_base = jnp.sum(jnp.where(jnp.arange(s) < ax, npix_sums, 0))
    pix_off = pix_base + scans.exclusive_cumsum(f["npix"])

    def astep(carry, x):
        return jnp.where(x >= 0, x, carry), carry

    _, alpha_entries = jax.lax.scan(astep, jnp.int32(255), alpha_fins)
    alpha_entry = alpha_entries[ax]
    prev_rgba = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_rgba_l[:-1]])
    alpha_opt = jnp.where(
        prev_rgba >= 0, f["b5"][jnp.maximum(prev_rgba, 0)].astype(jnp.int32),
        alpha_entry)

    # ---- stage 3: local affine hash maps + cross-shard composition -------
    m3, m5, m7, m11 = fmt.HASH_MULTIPLIERS
    i32 = lambda x: x.astype(jnp.int32)
    reset_val = jnp.where(
        f["is_rgba"],
        (m3 * i32(f["b2"]) + m5 * i32(f["b3"]) + m7 * i32(f["b4"]) + m11 * i32(f["b5"])) & 63,
        jnp.where(
            f["is_rgb"],
            (m3 * i32(f["b2"]) + m5 * i32(f["b3"]) + m7 * i32(f["b4"]) + m11 * alpha_opt) & 63,
            f["b1"] & 63))
    is_reset = (f["is_rgba"] | f["is_rgb"] | f["is_index"]) & valid
    add_val = jnp.where(
        valid,
        (m3 * i32(f["dr"]) + m5 * i32(f["dg"]) + m7 * i32(f["db"])) & 63, 0)

    def hcombine(a, b):
        ra, va = a
        rb, vb = b
        return rb | ra, jnp.where(rb, vb, (va + vb) & 63)

    r0 = is_reset.astype(jnp.int32)
    v0 = jnp.where(is_reset, reset_val, add_val)
    hr, hv = jax.lax.associative_scan(hcombine, (r0, v0))
    shard_h = (hr[-1], hv[-1])
    shard_hs = jax.lax.all_gather(shard_h, axis)             # ((S,), (S,))

    def hstep(carry, x):  # carry: entry hash scalar
        r, v = x
        return jnp.where(r == 1, v, (carry + v) & 63), carry

    _, h_entries = jax.lax.scan(hstep, jnp.int32(dp._SEED_HASH),
                                (shard_hs[0], shard_hs[1]))
    h_entry = h_entries[ax]
    hashes0 = jnp.where(valid, jnp.where(hr == 1, hv, (h_entry + hv) & 63), 0)

    # ---- stages 4-6 under the global hash fixpoint -----------------------
    def resolve_given_hashes(hashes):
        # local replay over global writer ids with cross-shard carry
        qk = jnp.where(f["is_index"], f["b1"] & 63, hashes)
        gids1 = (gid_base + io + 1).astype(jnp.uint32)
        _, (loc_tbl, loc_wr) = table.table_replay(
            hashes, gids1, write=valid)
        # fused per-round table exchange: values + written flags in one
        # (2, 64) gather (r5 collective audit)
        tw = jax.lax.all_gather(
            jnp.stack([loc_tbl.view(jnp.int32),
                       loc_wr.astype(jnp.int32)]), axis)      # (S, 2, 64)
        tbls = tw[:, 0].view(jnp.uint32)
        wrs = tw[:, 1] != 0

        def tstep(c, x):
            ct, cw = c
            t, w = x
            return (jnp.where(w, t, ct), cw | w), c

        zero = (jnp.zeros((64,), jnp.uint32), jnp.zeros((64,), bool))
        _, (inc_ts, inc_ws) = jax.lax.scan(tstep, zero, (tbls, wrs))
        inc = (inc_ts[ax], inc_ws[ax])
        target1, _ = table.table_replay(
            hashes, gids1, write=valid, incoming=inc, query_keys=qk)
        target = target1.astype(jnp.int32) - 1  # global chunk id, -1 = zero

        # symbolic parents: local node, or symbol (extra node)
        # extra nodes: 0 -> incoming px, 1+s -> incoming table slot s
        tgt_local = target - gid_base
        # parent per chunk: INDEX -> target/symbol; else previous chunk
        prev_loc = io - 1  # -1 -> symbol PX (extra node 0 = mb)
        parent1 = jnp.where(
            f["is_index"],
            jnp.where(target < 0, 0,                # zero-entry: anchored
                      jnp.where(tgt_local >= 0, tgt_local,
                                mb + 1 + (f["b1"] & 63))),
            jnp.where(prev_loc < 0, mb + 0, prev_loc))
        zero_hit = f["is_index"] & (target < 0)

        anchored_rgb = f["is_rgb"] | f["is_rgba"] | zero_hit | ~valid
        anchored_a = f["is_rgba"] | zero_hit | ~valid
        done0 = jnp.stack(
            [anchored_rgb, anchored_rgb, anchored_rgb, anchored_a], axis=1)
        u8 = lambda x: x.astype(jnp.uint8)
        lit = f["is_rgb"] | f["is_rgba"]
        anchor = jnp.stack([
            jnp.where(lit, u8(f["b2"]), 0),
            jnp.where(lit, u8(f["b3"]), 0),
            jnp.where(lit, u8(f["b4"]), 0),
            jnp.where(f["is_rgba"], u8(f["b5"]), 0),
        ], axis=1)
        delta = jnp.stack(
            [f["dr"], f["dg"], f["db"], jnp.zeros((mb,), jnp.uint8)], axis=1)
        parent = jnp.broadcast_to(parent1[:, None], (mb, 4)).astype(jnp.int32)

        root, acc = link.resolve_roots(parent, delta, done0, _NSYM)
        # root < mb: real anchored node -> value = anchor[root] + acc
        # root >= mb: symbol -> resolved after the shard compose
        real = root < mb
        base_val = jnp.where(
            real, jnp.take_along_axis(anchor, jnp.minimum(root, mb - 1), axis=0), 0)

        # ---- per-shard symbolic summaries (65 entries x 4 channels) ------
        # out px: dependence of last local chunk (or PX passthrough)
        def dep_of(node):  # node: local chunk id; returns (root,acc,base)
            r = root[node]
            return r, acc[node], base_val[node]

        has_chunks = nloc > 0
        last_node = jnp.maximum(nloc - 1, 0)
        px_root, px_acc, px_base_v = dep_of(last_node)
        px_root = jnp.where(has_chunks, px_root, mb + 0)
        px_acc = jnp.where(has_chunks, px_acc, 0)
        px_base_v = jnp.where(has_chunks, px_base_v, 0)

        # out table slot s: local final writer (loc_tbl/loc_wr) or passthrough
        wr_node = jnp.clip(loc_tbl.astype(jnp.int32) - 1 - gid_base, 0, mb - 1)
        t_root = jnp.where(loc_wr[:, None], root[wr_node], mb + 1 + jnp.arange(64)[:, None])
        t_acc = jnp.where(loc_wr[:, None], acc[wr_node], 0)
        t_base = jnp.where(loc_wr[:, None], base_val[wr_node], 0)

        sum_root = jnp.concatenate([px_root[None], t_root])   # (65, 4)
        sum_acc = jnp.concatenate([px_acc[None], t_acc])
        sum_base = jnp.concatenate([px_base_v[None], t_base])
        sum_real = sum_root < mb

        # fused summary exchange: acc/base bytes + real flag pack into
        # one i32 plane next to the root plane -> ONE (65, 8) gather
        # instead of four (r5 collective audit)
        acb = (sum_acc.astype(jnp.int32) | sum_base.astype(jnp.int32) << 8
               | sum_real.astype(jnp.int32) << 16)
        summ = jax.lax.all_gather(
            jnp.concatenate([sum_root.astype(jnp.int32), acb], axis=1),
            axis)                                             # (S, 65, 8)
        roots_g = summ[:, :, :4]
        accs_g = (summ[:, :, 4:] & 0xFF).astype(jnp.uint8)
        bases_g = ((summ[:, :, 4:] >> 8) & 0xFF).astype(jnp.uint8)
        reals_g = (summ[:, :, 4:] >> 16) != 0

        # replicated sequential compose: numeric incoming symbols per shard
        init = jnp.concatenate([
            _SEED[None], jnp.zeros((64, 4), jnp.uint8)])      # (65, 4)

        def cstep(carry, x):  # carry: numeric (65,4) uint8
            r, a, b, re = x
            sym = jnp.clip(r - mb, 0, _NSYM - 1)
            out = jnp.where(re, b + a,
                            jnp.take_along_axis(carry, sym, axis=0) + a)
            return out, carry

        _, numeric_ins = jax.lax.scan(cstep, init, (roots_g, accs_g, bases_g, reals_g))
        numeric_in = numeric_ins[ax]                          # (65, 4)

        sym_idx = jnp.clip(root - mb, 0, _NSYM - 1)
        px_vals = jnp.where(
            real, base_val + acc,
            jnp.take_along_axis(numeric_in, sym_idx, axis=0) + acc)
        return px_vals

    def fix_body(state):
        hashes, _, _, it = state
        px = resolve_given_hashes(hashes)
        true_h = jnp.where(valid, table.hash64(px), 0)
        bad = jnp.sum((true_h != hashes).astype(jnp.int32))
        bad = jax.lax.psum(bad, axis)
        return true_h, px, bad == 0, it + 1

    def fix_cond(state):
        _, _, conv, it = state
        return ~conv & (it < _MAX_ITERS)

    px0 = jnp.zeros((mb, 4), jnp.uint8)
    hashes, px, conv, _ = jax.lax.while_loop(
        fix_cond, fix_body, (hashes0, px0, jnp.bool_(False), jnp.int32(0)))
    px = resolve_given_hashes(hashes)

    return px, f["npix"], pix_off, nloc[None], conv[None]


def _expand_tiled(px, npix, pix_off, nloc, axis: str, n_px_cap: int):
    """On-device sharded run expansion (SURVEY §7.3 stage: chunk -> pixel).

    Each shard holds chunk-slot values px (mb, 4) u8 with GLOBAL pixel
    offsets. Expansion rides the mesh: per-chunk mod-256 SWAR deltas vs
    the previous chunk (cross-shard carry via an all_gather'd compose),
    locally scattered into the global delta plane, reduce-scattered over
    `axis` (ICI, not host), then a sharded mod-256 prefix scan turns
    deltas into pixel values. Run interiors get no delta so they repeat
    the chunk px — the reference's run semantics (qoi.h:532-537) — and
    pixels past the last chunk keep its value (truncation tolerance).

    Returns the shard's (n_px_cap / S,) slice of the packed-u32 pixels.
    """
    mb = px.shape[0]
    s = jax.lax.axis_size(axis)
    ax = jax.lax.axis_index(axis)
    io = jnp.arange(mb, dtype=jnp.int32)
    valid = io < nloc

    px32 = (px[:, 0].astype(jnp.uint32)
            | px[:, 1].astype(jnp.uint32) << 8
            | px[:, 2].astype(jnp.uint32) << 16
            | px[:, 3].astype(jnp.uint32) << 24)

    # incoming pixel: previous shard's last valid chunk px (seed if none)
    # — has-flag and pixel word fused into ONE gather (r5 audit)
    has = nloc > 0
    last_px = px32[jnp.maximum(nloc - 1, 0)]
    hl = jax.lax.all_gather(
        jnp.stack([last_px.view(jnp.int32), has.astype(jnp.int32)]),
        axis)                                                 # (S, 2)
    hass = hl[:, 1] != 0
    lasts = hl[:, 0].view(jnp.uint32)

    def pstep(carry, x):
        h, v = x
        return jnp.where(h, v, carry), carry

    seed32 = jnp.uint32(
        fmt.SEED_PIXEL[0] | fmt.SEED_PIXEL[1] << 8
        | fmt.SEED_PIXEL[2] << 16 | fmt.SEED_PIXEL[3] << 24)
    _, entries = jax.lax.scan(pstep, seed32, (hass, lasts))
    px_in = entries[ax]

    prev = jnp.concatenate([px_in[None], px32[:-1]])
    # per-channel mod-256 deltas packed 2 per i32 (16-bit lanes)
    def ch(v, k):
        return ((v >> (8 * k)) & 0xFF).astype(jnp.int32)

    d = [(ch(px32, k) - ch(prev, k)) & 0xFF for k in range(4)]
    dlo = jnp.where(valid, d[0] | d[1] << 16, 0)
    dhi = jnp.where(valid, d[2] | d[3] << 16, 0)

    # local scatter into the global delta plane; chunk pixel offsets are
    # globally unique (every chunk emits >= 1 px), invalid slots drop
    idx = jnp.where(valid, pix_off, n_px_cap + io)
    plane_lo = jnp.zeros((n_px_cap,), jnp.int32).at[idx].add(dlo, mode="drop")
    plane_hi = jnp.zeros((n_px_cap,), jnp.int32).at[idx].add(dhi, mode="drop")
    # deltas onto this shard's pixel range, summed over shards via ICI —
    # both 16-bit-lane planes in ONE reduce_scatter (r5 audit)
    loc_lo, loc_hi = jax.lax.psum_scatter(
        jnp.stack([plane_lo, plane_hi]), axis,
        scatter_dimension=1, tiled=True)

    # sharded inclusive mod-256 prefix (16-bit lanes keep the residues)
    m = jnp.int32(0x00FF00FF)

    def comb(a, b):
        la, ha = a
        lb, hb = b
        return ((la + lb) & m), ((ha + hb) & m)

    sl, sh = scans.blocked_scan(comb, (loc_lo & m, loc_hi & m))
    tots = jax.lax.all_gather(jnp.stack([sl[-1], sh[-1]]), axis)  # (S, 2)

    def estep(carry, x):
        return comb(carry, x), carry

    _, excls = jax.lax.scan(estep, (jnp.int32(0), jnp.int32(0)),
                            (tots[:, 0], tots[:, 1]))
    sl, sh = comb((excls[0][ax], excls[1][ax]), (sl, sh))

    # apply the seed and repack to u32 pixels
    out = (((sl + jnp.int32(fmt.SEED_PIXEL[0])) & 0xFF)
           | (((sl >> 16) + jnp.int32(fmt.SEED_PIXEL[1])) & 0xFF) << 8
           | (((sh + jnp.int32(fmt.SEED_PIXEL[2])) & 0xFF) << 16)
           | (((sh >> 16) + jnp.int32(fmt.SEED_PIXEL[3])) & 0xFF) << 24)
    return out.astype(jnp.uint32)


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def _decode_tiled_device(data, chunks_len, *, mesh: Mesh, axis: str):
    fn = jax.shard_map(
        functools.partial(_tile_step, axis=axis),
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return fn(data, chunks_len)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "n_px_cap"))
def _decode_expand_device(data, chunks_len, *, mesh: Mesh, axis: str,
                          n_px_cap: int):
    """Full sharded decode incl. on-device run expansion: returns the
    packed-u32 pixel plane sharded over `axis` plus convergence flags."""

    def step(data, chunks_len):
        px, npix, pix_off, nloc, conv = _tile_step(data, chunks_len, axis=axis)
        out = _expand_tiled(px, npix, pix_off, nloc[0], axis, n_px_cap)
        return out, conv

    fn = jax.shard_map(
        step, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,
    )
    return fn(data, chunks_len)


def decode_tiled(data: bytes, mesh: Mesh, channels: int = 0,
                 axis: str = sharding.SEQ_AXIS) -> Tuple[np.ndarray, fmt.StreamDesc]:
    """Decode one stream with its bytes sharded over `axis` of `mesh`;
    pixel-identical to the reference decoder (qoi.h:488). Falls back to the
    single-device pipeline if the sharded fixpoint does not converge."""
    if channels not in (0, 3, 4):
        raise ValueError(f"channels must be 0, 3 or 4, got {channels}")
    desc = fmt.unpack_header(data)
    out_ch = channels if channels else desc.channels

    body = np.frombuffer(data, np.uint8)[fmt.HEADER_SIZE:]
    chunks_len = len(data) - fmt.HEADER_SIZE - fmt.TRAILER_SIZE
    s = mesh.shape[axis]
    mb = max(-(-len(body) // s), 8)
    padded = np.zeros((s * mb,), np.uint8)
    padded[: len(body)] = body

    n_px = desc.num_pixels
    n_px_cap = -(-max(n_px, 1) // (64 * s)) * 64 * s

    x = jax.device_put(jnp.asarray(padded), NamedSharding(mesh, P(axis)))
    px32, conv = _decode_expand_device(
        x, jnp.int32(chunks_len), mesh=mesh, axis=axis, n_px_cap=n_px_cap)
    if not bool(np.all(np.asarray(jax.device_get(conv)))):
        return dp.decode(data, channels)

    flat = np.ascontiguousarray(
        np.asarray(jax.device_get(px32))).view(np.uint8).reshape(-1, 4)[:n_px]
    img = flat[:, :out_ch].reshape(desc.height, desc.width, out_ch)
    return img, desc
