#!/usr/bin/env python3
"""Same-process A/B harness for the TPU hot paths.

This platform's per-program floor drifts 25-70 ms BETWEEN processes and
`block_until_ready` can return early (PERF_NOTES.md), so the only
trustworthy comparisons are same-script, host-fetch-synced, min-of-N.
This tool packages that discipline for the three recurring experiments:

    python tools/abperf.py encode   # compaction seg x program structure
    python tools/abperf.py decode   # batch structure x expand accumulate
    python tools/abperf.py expand   # expand kernel tile/accum standalone

Every timed variant is verified first (encode: byte-identical to the
C++ oracle; decode: pixel-identical to the source, on device; expand:
checksum-identical across variants after one XLA-reference check).
Results print one line per variant to stdout; diagnostics to stderr.
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 6
_ONLY = []


def _selected(name: str) -> bool:
    return not _ONLY or any(t in name for t in _ONLY)


W, H = 3840, 2160
_EXPAND_M = 1 << 24
_MINI = False


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _floor_probe(jax, jnp, x):
    """The 'floor' is dominated by the D2H fetch ROUND-TRIP, not program
    dispatch: 8 trivial programs + one combined fetch cost barely more
    than 1 program + 1 fetch, while 8 serial fetches cost ~8x. Print
    both so every A/B log carries its own floor calibration."""
    f = jax.jit(lambda p: (jnp.ravel(p)[:8].astype(jnp.int32) + 1))
    comb = jax.jit(lambda ts: jnp.stack(ts))
    int(jax.device_get(f(x))[0])
    ts, t8 = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        int(jax.device_get(f(x))[0])
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.device_get(comb([f(x) for _ in range(8)]))
        t8.append(time.perf_counter() - t0)
    print(f"floor: 1 prog+fetch min {min(ts)*1e3:.1f} ms, "
          f"8 progs+1 fetch min {min(t8)*1e3:.1f} ms "
          f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)


def _mins(fn):
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), ts


def cmd_encode(batch_frames: int = 8):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qoi_tpu import format as fmt, oracle
    from qoi_tpu.models import pipeline
    from qoi_tpu.ops import compact
    from qoi_tpu.utils import testimages

    desc = fmt.StreamDesc(W, H, 4)
    n = desc.num_pixels
    cap = -(-n // 1024) * 1024
    frames = [testimages.mixed(W, H, 4, seed=3 + i)
              for i in range(batch_frames)]
    batch = np.zeros((batch_frames, cap, 4), np.uint8)
    for i, f in enumerate(frames):
        batch[i, :n] = pipeline.force_rgba(f, desc)
    xs = [jax.device_put(jnp.asarray(batch[i])) for i in range(batch_frames)]
    xb = jax.device_put(jnp.asarray(batch))
    want0 = oracle.encode(frames[0], desc)
    _floor_probe(jax, jnp, xs[0])

    def verify(buf, tot):
        tot = int(jax.device_get(tot))
        raw = np.asarray(jax.device_get(buf))
        if raw.dtype != np.uint8:  # words_out form: u32 LE words
            raw = raw.view(np.uint8)
        s = (fmt.pack_header(desc) + raw[:tot].tobytes() + fmt.TRAILER)
        assert s == want0, "oracle mismatch"

    import copy_kernel as kcopy  # tools/-local: measured dead end
    from qoi_tpu.kernels import pack as kpack

    # pipe = the production fused program, per-frame dispatch (hardware
    # round-2 results: barrier 52-61 Mpx/s, map 97.8 vs pipe 104.3 — the
    # Pallas HBM-copy barrier costs far more than the fusion penalty it
    # was meant to dodge). pack-T = record-densify sort + the Pallas
    # placement kernel (kernels/pack.py) at output tile T words.
    # Measured (r2, 8-deep pipelined dispatch, per-frame): stages 34.4,
    # +densify/prep 18.9 (packprep 53.3), +kernel grid ~1.6 (packnoop
    # 54.9), +kernel body 24.7 (pack 79.6 == pipe 79.6; tile 8192 ==
    # 2048 — body-bound). v* = ONE vmapped program for the whole batch
    # (round-1 stages vmap-4 was 13.5 ms/frame vs 36 single; the giant
    # batched sort blocked vmap then, the pack kernel doesn't).
    # split* = TWO pipelined programs per frame: A materializes the
    # staging planes (or dense records), B compacts from them. At 8-deep
    # dispatch the program floors overlap, so the split only pays each
    # program's REAL cost — the point is to dodge the ~1.8x fused-program
    # remat tax on densify+place (PERF_NOTES: 10.4->18.9, 14.4->24.7).
    # vmapped one-program variants are DEAD (hardware r2): vstages 160.4
    # Mpx/s < pipelined stages 238.4 (vmap no longer amortizes at batch
    # 8), and vpack OOMs HBM at compile (u32[8,12.4M,4] = 25 GB batched
    # broadcast inside the place kernel's operand prep).
    # wsum = the round-3 word-sum placement primitive
    # (ops/compact.compact_bytes6_wordsum): pure XLA, no sort, no
    # placement kernel — one event-list slide + a cumsum difference.
    # Hardware r3 first pass: wsum4k 116.5 Mpx/s > splitdyn 108.2 >
    # pipe 103.4; "wsum8k" (8192 does not divide n) silently fell back
    # to ONE giant 16.6M-slot row = 24 full-width slide passes, 70.8.
    # vwsum (vmapped whole batch) DIES at compile: the final vmapped
    # u32->u8 bitcast broadcasts u32[8,12.4M,4] at 25 GB padded.
    # wsev/wsslide = phase ablations (events only / events+slide,
    # checksum-only); wsplit = TWO pipelined programs (A=stages+events,
    # B=slide+assemble) to dodge the fused remat tax.
    # Hardware r3 second pass: wsum phase split per frame (over stages
    # 34.5) = events 8.2 + slide 11.5 + assemble 16.6; wsum 117.2 ==
    # wsplit 117.5 == wsum6k 118.3 (no remat tax to dodge, seg flat).
    # wsumNN = seg sweep into the NARROW-row regime: the slide is
    # log2(2*seg) full-array passes, so seg=64 (128-lane rows) needs 7
    # passes vs 12 at seg=4096. st* = intra-stages ablations (checksum
    # only): steq = pixel-shift eq mask; strun = eq + run segmentation;
    # sttab = eq + table replay.
    # Hardware r3 third pass — THE FETCH-RTT DISCOVERY: the ~24-45 ms
    # "per-program floor" is mostly the D2H fetch round-trip, and the
    # old run() did one device_get PER FRAME, serially: 8 trivial
    # programs + 8 fetches = 388 ms vs the same 8 programs + ONE
    # combiner program + ONE fetch = 34 ms. Every pipelined variant is
    # now synced via the combiner (one fetch per rep); *sf = the old
    # serial-fetch discipline kept for the record. Narrow-seg sweep is
    # CLOSED (1k/256/64: 99.6/60.4/23.2 Mpx/s — tall-skinny rows die);
    # intra-stages: eq+runs+table ~3 ms/frame real, classify+staging
    # ~7.5 — stages is floor-dominated.
    comb = jax.jit(lambda ts: jnp.stack(ts))

    def sync(outs):
        np.asarray(jax.device_get(comb([t for _, t in outs])))

    # Hardware r3 fourth pass agenda: the combined fetch showed the 8
    # frames are DEVICE-bound (~68 ms/frame: fetch RTTs hide behind
    # device execution except on trivial programs) — so the old st*
    # numbers were pure fetch artifacts. Re-ablating with honest sync:
    # sttab8k = table lax.map chunk 8192 (4x fewer sequential map
    # steps); wsr4 = radix-4 slide (6 passes of 3-candidate selects vs
    # 12 of 1); wsnob = words_out u32 form (no final u32->u8 bitcast —
    # the known relayout trap) — still a VALID verified encode, the
    # host .view(uint8) is free.
    # Hardware r3 fifth pass agenda: wsnob (no-bitcast) won pass 4 at
    # 137 vs wsum 112.8 (the u32->u8 bitcast was ~13 ms/frame!);
    # sttab8k == sttab (lax.map chunk not the issue). Now: wstages =
    # form='words' staging ablation (classifier emits packed record
    # words directly, no (6,N) byte planes — byte-form classify+staging
    # was ~15.3 ms/frame); wsw = words staging + word-sum + words_out
    # (the bench.py production program); wsw4 = + radix-4 slide.
    # Pass 6 (rev): sub_rows = subrow-relative slide distances — 7
    # passes at sub_rows=128 (9 at 512) instead of 13 at segment width,
    # same wide pass shapes, subrow-granular assemble scatter. (The
    # table_block=32 variant STALLED the remote compiler >30 min on its
    # fresh shapes — parked; see PERF_NOTES stuck-compile hazard.)
    # sub_rows on TPU: 24.4 / 68.8 Mpx/s at 128 / 512 vs wsw 159.4 —
    # the (nsub, R) tall-skinny events/assemble ops kill it exactly like
    # the narrow-seg sweep. CLOSED; kept as a tested compact option.
    # wswk = the VMEM slide kernel (kernels/slide.py): all 13 passes
    # in-register, HBM sees each plane once per direction.
    # Hardware r3: wswk (VMEM slide) 192.0 vs wsw 159.8 — the slide
    # kernel is the production path. table_block=32 is COMPILE-
    # PATHOLOGICAL: its (nb, 32, 32) mask families stall the remote
    # compiler >15 min on BOTH attempts (every other program compiles in
    # 20-90 s) — closed, 64 stays.
    # table_block=128: the int8-iota limit. At tb=64 every (.., 64, 64)
    # mask family pads its 64-lane minor dim to 128 (half the VPU lanes
    # dead) and the int32 comb families waste the same way; tb=128 fills
    # the lanes and HALVES the block count for the summary/carry side.
    # (tb=32 was compile-pathological — the hazard direction is smaller
    # blocks, not bigger.)
    # Hardware r4 pass 1: tb=128 LOSES (wswk128 207.5 vs wswk 226.6 —
    # the in-block brute work doubles and dominates the lane-fill win);
    # wstages (tb=64) 374.2 Mpx/s = 21.4 ms/frame, so compaction-side
    # is ~15 ms/frame of the 36.6. Pass 2 agenda: the full phase ladder
    # under honest combined-fetch sync — steq -> strun -> sttabA
    # (table_hit_local only: the in-block brute families) -> sttab
    # (+ carry scan + one-hot select) -> wstages (+ classify/emit) ->
    # wswev (+ events) -> wswevs (+ VMEM slide) -> wswk (full encode);
    # adjacent differences isolate every phase.
    # *xc = same variant with scans._BLOCKED_CUM=False (jnp.cumsum /
    # lax.cummax instead of blocked_scan): the standalone probe says
    # XLA's native cumsum is fine — in-context A/B decides the default
    # wswk12k/20k = seg sweep into FEWER scatter rows (the r4 ladder
    # says assemble+final is the biggest phase at 8.6 ms/frame; the
    # VMEM slide kernel makes longer rows nearly free, so nseg
    # 2025 -> 675/405 cuts the windowed scatter's row count 3-5x).
    # seg must divide cap=8294400 (max pow2 factor 4096; 12288 = 3x,
    # 20480 = 5x — the r3 "wsum8k" one-giant-segment trap).
    for name, seg, mode in (("wswk", 4096, "wswk"),
                            ("wswk12k", 12288, "wswk"),
                            ("wswk20k", 20480, "wswk"),
                            ("wswk24k", 24576, "wswk"),
                            ("wswk36k", 36864, "wswk"),
                            ("wswk61k", 61440, "wswk"),
                            ("wswk102k", 102400, "wswk"),
                            ("wswkxc", 4096, "wswk"),
                            ("steq", 0, "steq"),
                            ("strun", 0, "strun"),
                            ("strunxc", 0, "strun"),
                            ("sttabA", 0, "sttabA"),
                            ("sttab", 0, "sttab"),
                            ("wstages", 0, "wstages"),
                            ("wswev", 4096, "wswev"),
                            ("wswevxc", 4096, "wswev"),
                            ("wswevs", 4096, "wswevs")):
        if not _selected(name):
            continue
        from qoi_tpu.ops import scans as _qsc
        _qsc._BLOCKED_CUM = not name.endswith("xc")
        jax.clear_caches()

        def enc_body(p, s=seg, m=mode):
            if m.startswith("wstages") or m.startswith("wsw"):
                # (wswk routes via the same wsw body below)
                tb = int(m.split(":")[1]) if ":" in m else 64
                sr = int(m.split("@")[1]) if "@" in m else 0
                m = m.split(":")[0].split("@")[0]
                ch = pipeline.encode_stage_chunks(p, jnp.int32(n),
                                                  form="words",
                                                  table_block=tb)
                if m == "wstages":
                    cs = (jnp.sum(ch.lo.view(jnp.int32))
                          + jnp.sum(ch.hi.view(jnp.int32))
                          + jnp.sum(ch.lens))
                    return cs[None].astype(jnp.uint8), cs
                if m in ("wswev", "wswevs"):
                    ev = compact._wordsum_events_words(
                        ch.lo, ch.hi, ch.lens, seg=s)
                    if m == "wswevs":
                        from qoi_tpu.kernels.slide import slide_val
                        val = slide_val(ev[0], ev[1], interpret=_MINI)
                        cs = (jnp.sum(val.view(jnp.int32))
                              + jnp.sum(ev[2]) + jnp.sum(ev[3]))
                    else:
                        cs = (jnp.sum(ev[0].view(jnp.int32))
                              + jnp.sum(ev[1]) + jnp.sum(ev[2]))
                    return cs[None].astype(jnp.uint8), cs
                return compact.compact_words6_wordsum(
                    ch.lo, ch.hi, ch.lens, cap * 6, seg=s,
                    radix=4 if m == "wsw4" else 2, words_out=True,
                    sub_rows=sr, slide="kernel" if m == "wswk" else "xla",
                    interpret=_MINI)
            if m in ("steq", "strun", "sttab", "sttab8k", "sttabA"):
                from qoi_tpu.ops import scans, table
                prev = jnp.concatenate(
                    [pipeline._SEED[None].astype(jnp.uint8), p[:-1]], axis=0)
                eq = jnp.all(p == prev, axis=-1)
                if m == "steq":
                    cs = jnp.sum(eq.astype(jnp.int32))
                elif m == "sttabA":
                    loc = table.table_hit_local(
                        table.hash64(p), table.pack_rgba(p), write=~eq)
                    cs = sum(jnp.sum(x.astype(jnp.int32)) for x in loc)
                elif m == "strun":
                    runs = scans.run_segmentation(eq, last_pos=n - 1)
                    cs = (jnp.sum(runs.run_val) + jnp.sum(runs.flush_val)
                          + jnp.sum(runs.emits_run.astype(jnp.int32))
                          + jnp.sum(runs.flush.astype(jnp.int32)))
                else:
                    old = table._SEG_BLOCKS
                    if m == "sttab8k":
                        table._SEG_BLOCKS = 8192
                    try:
                        hit0, (tbl, wr) = table.table_hit(
                            table.hash64(p), table.pack_rgba(p), write=~eq)
                    finally:
                        table._SEG_BLOCKS = old
                    cs = (jnp.sum(hit0.astype(jnp.int32))
                          + jnp.sum(tbl.view(jnp.int32))
                          + jnp.sum(wr.astype(jnp.int32)))
                return cs[None].astype(jnp.uint8), cs
            ch = pipeline.encode_stage_chunks(p, jnp.int32(n))
            st, ln = ch.staging, ch.lens
            if m == "wsum":
                return compact.compact_bytes6_wordsum(st, ln, cap * 6, seg=s)
            if m == "wsr4":
                return compact.compact_bytes6_wordsum(st, ln, cap * 6, seg=s,
                                                      radix=4)
            if m == "wsnob":
                return compact.compact_bytes6_wordsum(st, ln, cap * 6, seg=s,
                                                      words_out=True)
            if m == "wsev":
                ev = compact._wordsum_events(st, ln, seg=s)
                return (jnp.sum(ev[0].view(jnp.int32)) + jnp.sum(ev[1])
                        )[None].astype(jnp.uint8), ev[4]
            if m == "wsslide":
                ev = compact._wordsum_events(st, ln, seg=s)
                val, aux = compact._wordsum_slide(ev[0], ev[1])
                return (jnp.sum(val.view(jnp.int32)) + jnp.sum(aux)
                        )[None].astype(jnp.uint8), ev[4]
            if m == "stages":
                # compaction ablated: bounds the stages' in-context cost
                # (NOT a valid encode — stream checksum only)
                return (jnp.sum(st.view(jnp.int8).astype(jnp.int32))
                        + jnp.sum(ln))[None].astype(jnp.uint8), jnp.sum(ln)
            if m == "packprep":
                # densify + prep, place kernel ablated (checksum only)
                off_d, lo_d, hi_d, _ = kpack._densify_shift(st, ln)
                return (jnp.sum(off_d) + jnp.sum(lo_d) + jnp.sum(hi_d)
                        )[None].astype(jnp.uint8), jnp.sum(ln)
            if m == "packnoop":
                # full pack but total=0: every kernel tile skips its
                # body — bounds the in-context grid/DMA-issue overhead
                off_d, lo_d, hi_d, _ = kpack._densify_shift(st, ln)
                wp, c0, c1 = kpack._prep_planes(off_d, lo_d, hi_d,
                                                jnp.sum(ln))
                words = kpack._place_words(
                    wp, c0, c1, jnp.int32(0), cap * 6 // 4, 2048, 128,
                    interpret=_MINI)
                return (jnp.sum(words))[None].astype(jnp.uint8), jnp.sum(ln)
            if m == "pack":
                return kpack.compact_bytes6_pack(
                    st, ln, cap * 6, tile=s, interpret=_MINI)
            return compact.compact_bytes6(st, ln, cap * 6, seg=s)

        if mode == "wsplit":
            prog_a = jax.jit(lambda p, s=seg: compact._wordsum_events(
                *(lambda ch: (ch.staging, ch.lens))(
                    pipeline.encode_stage_chunks(p, jnp.int32(n))), seg=s))
            prog_b = jax.jit(lambda val, aux, *rest: compact._wordsum_assemble(
                *compact._wordsum_slide(val, aux), *rest, capacity=cap * 6))

            def run(a=prog_a, b=prog_b):
                outs = [b(*a(x)) for x in xs]
                sync(outs)
                return outs[0]
        elif mode in ("split", "splitd", "splitdyn"):
            win = "dyn" if mode == "splitdyn" else "static"
            if mode == "split":
                prog_a = jax.jit(lambda p: (
                    lambda ch: (ch.staging, ch.lens))(
                    pipeline.encode_stage_chunks(p, jnp.int32(n))))
                prog_b = jax.jit(lambda st, ln, s=seg: kpack.compact_bytes6_pack(
                    st, ln, cap * 6, tile=s, interpret=_MINI))
            else:
                def a_body(p):
                    ch = pipeline.encode_stage_chunks(p, jnp.int32(n))
                    off_d, lo_d, hi_d, _ = kpack._densify_shift(
                        ch.staging, ch.lens)
                    return off_d, lo_d, hi_d, jnp.sum(ch.lens).astype(jnp.int32)

                def b_body(off_d, lo_d, hi_d, total, s=seg, w=win):
                    wp, c0, c1 = kpack._prep_planes(off_d, lo_d, hi_d, total)
                    words = kpack._place_words(
                        wp, c0, c1, total, cap * 6 // 4, s, 128,
                        interpret=_MINI, window=w)
                    return (jax.lax.bitcast_convert_type(
                        words, jnp.uint8).reshape(-1), total)

                prog_a = jax.jit(a_body)
                prog_b = jax.jit(b_body)

            def run(a=prog_a, b=prog_b):
                outs = [b(*a(x)) for x in xs]
                sync(outs)
                return outs[0]
        elif name.startswith("v"):
            @jax.jit
            def enc_vmap(pb, body=enc_body):
                return jax.vmap(body)(pb)

            def run(e=enc_vmap):
                bufs, tots = e(xb)
                int(jax.device_get(tots[-1]))
                return bufs[0], tots[0]
        elif name == "map":
            @jax.jit
            def enc_map(pb, body=enc_body):
                return jax.lax.map(body, pb)

            def run(e=enc_map):
                bufs, tots = e(xb)
                int(jax.device_get(tots[-1]))
                return bufs[0], tots[0]
        else:
            enc_one = jax.jit(enc_body)

            if name.endswith("sf"):  # legacy serial-fetch discipline
                def run(e=enc_one):
                    outs = [e(x) for x in xs]
                    for _, t in outs:
                        int(jax.device_get(t))
                    return outs[0]
            else:
                def run(e=enc_one):
                    outs = [e(x) for x in xs]
                    sync(outs)
                    return outs[0]

        t0 = time.perf_counter()
        base_mode = mode.split(":")[0].split("@")[0]
        if base_mode in ("stages", "packprep", "packnoop", "wsev", "wsslide",
                         "steq", "strun", "sttab", "sttab8k", "sttabA",
                         "wstages", "wswev", "wswevs"):
            run()  # checksum program, nothing to verify
        else:
            verify(*run())
        log(f"{name} seg={seg} compile+verify {time.perf_counter()-t0:.0f}s")
        mn, ts = _mins(run)
        print(f"{name} seg={seg}: min {mn*1e3:.0f} ms "
              f"({batch_frames*n/1e6/mn:.1f} Mpx/s) "
              f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    # restore the production cumsum default after the sweep: the *xc
    # entries flip scans._BLOCKED_CUM per-variant and correctness of any
    # later command in the same process must not depend on table order
    # (ADVICE r4)
    from qoi_tpu.ops import scans as _qsc_restore
    _qsc_restore._BLOCKED_CUM = True
    jax.clear_caches()


def cmd_pack():
    """Phase ablation for the pack-kernel compaction (kernels/pack.py)
    at the bench shape: where do the ~18 ms/frame vs the two-tier sort
    go — densify sort, contribution prep, or the placement kernel?"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qoi_tpu import format as fmt
    from qoi_tpu.kernels import pack as kpack
    from qoi_tpu.models import pipeline
    from qoi_tpu.ops import compact
    from qoi_tpu.utils import testimages

    desc = fmt.StreamDesc(W, H, 4)
    n = desc.num_pixels
    cap = -(-n // 1024) * 1024
    img = pipeline.force_rgba(testimages.mixed(W, H, 4, seed=3), desc)
    padded = np.zeros((cap, 4), np.uint8)
    padded[:n] = img
    x = jax.device_put(jnp.asarray(padded))
    _floor_probe(jax, jnp, x)

    stage = jax.jit(lambda p: pipeline.encode_stage_chunks(p, jnp.int32(n)))
    ch = jax.block_until_ready(stage(x))
    st = jax.device_put(ch.staging)
    ln = jax.device_put(ch.lens)

    def timeit(name, f, *args):
        g = jax.jit(f)
        out = g(*args)
        s0 = int(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]
                                .astype(jnp.int32)))
        mn, ts = _mins(lambda: int(jax.device_get(
            jnp.ravel(jax.tree.leaves(g(*args))[0])[0].astype(jnp.int32))))
        print(f"{name}: min {mn*1e3:.1f} ms "
              f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)
        return s0

    timeit("two-tier compact", lambda a, b: compact.compact_bytes6(
        a, b, cap * 6), st, ln)
    timeit("densify sort", lambda a, b: kpack._densify_sort(a, b)[1], st, ln)
    timeit("densify shift", lambda a, b: kpack._densify_shift(a, b)[1],
           st, ln)

    def prep_shift(a, b):
        off_d, lo_d, hi_d, _ = kpack._densify_shift(a, b)
        s = ((off_d & 3) << 3).astype(jnp.uint32)
        lo_u = lo_d.view(jnp.uint32)
        hi_u = hi_d.view(jnp.uint32)
        c0 = lo_u << s
        c1 = ((lo_u >> 1) >> (31 - s)) | (hi_u << s)
        c2 = (hi_u >> 1) >> (31 - s)
        return (off_d >> 2) + c0.view(jnp.int32) + c1.view(jnp.int32) \
            + c2.view(jnp.int32)

    timeit("prep shift no kernel", prep_shift, st, ln)
    timeit("pack full sort", lambda a, b: kpack.compact_bytes6_pack(
        a, b, cap * 6, tile=2048, interpret=_MINI, densify="sort")[0],
        st, ln)
    timeit("pack full shift", lambda a, b: kpack.compact_bytes6_pack(
        a, b, cap * 6, tile=2048, interpret=_MINI, densify="shift",
        barrier=False)[0], st, ln)
    timeit("pack full shift ob", lambda a, b: kpack.compact_bytes6_pack(
        a, b, cap * 6, tile=2048, interpret=_MINI, densify="shift",
        barrier=True)[0], st, ln)
    timeit("pack shift t4096", lambda a, b: kpack.compact_bytes6_pack(
        a, b, cap * 6, tile=4096, interpret=_MINI, densify="shift",
        barrier=True)[0], st, ln)

    # kernel alone: densified records precomputed outside the timed fn
    off_d, lo_d, hi_d, len_d = jax.block_until_ready(
        jax.jit(kpack._densify_sort)(st, ln))
    total = jax.block_until_ready(
        jax.jit(lambda l: jnp.sum(l))(ln)).astype(jnp.int32)
    dargs = [jax.device_put(v) for v in (off_d, lo_d, hi_d)]

    def place_only(off_v, lo_v, hi_v):
        s = ((off_v & 3) << 3).astype(jnp.uint32)
        lo_u = lo_v.view(jnp.uint32)
        hi_u = hi_v.view(jnp.uint32)
        c0 = (lo_u << s).view(jnp.int32)
        c1 = (((lo_u >> 1) >> (31 - s)) | (hi_u << s)).view(jnp.int32)
        c2 = ((hi_u >> 1) >> (31 - s)).view(jnp.int32)
        wp = jnp.concatenate([off_v >> 2, (total >> 2)[None]])
        c0 = jnp.concatenate([c0[:1], c0[1:] | c2[:-1], c2[-1:]])
        c1 = jnp.concatenate([c1, jnp.zeros((1,), jnp.int32)])
        return kpack._place_words(
            wp, c0, c1, total, cap * 6 // 4, 2048, 128,
            interpret=_MINI)

    timeit("place kernel only", place_only, *dargs)


def cmd_decode(unique_streams: int = 8, content: str = "photo"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qoi_tpu import format as fmt, oracle
    from qoi_tpu.models import decode_pipeline as v1, decode_v3 as v3, pipeline
    from qoi_tpu.utils import testimages

    desc = fmt.StreamDesc(W, H, 4)
    n = desc.num_pixels
    b = unique_streams
    gen = getattr(testimages, content)
    dframes = [gen(W, H, 4, seed=3 + i) for i in range(b)]
    streams = [oracle.encode(f, desc) for f in dframes]
    mcap = v1.bucket_size_fine(max(len(s) for s in streams) - fmt.HEADER_SIZE)
    npc = v1.bucket_size(n)
    bodies = np.zeros((b, mcap), np.uint8)
    clens = np.zeros((b,), np.int32)
    for i, s in enumerate(streams):
        raw = np.frombuffer(s, np.uint8)[fmt.HEADER_SIZE:]
        bodies[i, :len(raw)] = raw
        clens[i] = len(s) - fmt.HEADER_SIZE - fmt.TRAILER_SIZE
    db = jax.device_put(jnp.asarray(bodies))
    dc = jax.device_put(jnp.asarray(clens))
    src0 = np.zeros((npc,), np.uint32)
    p0 = pipeline.force_rgba(dframes[0], desc).astype(np.uint32)
    src0[:n] = p0[:, 0] | p0[:, 1] << 8 | p0[:, 2] << 16 | p0[:, 3] << 24
    dsrc0 = jax.device_put(jnp.asarray(src0))
    _floor_probe(jax, jnp, db)

    check0 = jax.jit(lambda out: jnp.all(out[:n] == dsrc0[:n]))

    def dup(x, k):
        return jnp.concatenate([x] * k, axis=0)

    def bench(name, f, d, c):
        if not _selected(name):
            return
        try:
            _bench(name, f, d, c)
        except Exception as e:  # OOM at compile etc: record, keep sweeping
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)

    def _bench(name, f, d, c):
        t0 = time.perf_counter()
        out, conv, _ = f(d, c)
        okc = bool(jax.device_get(jnp.all(conv)))
        ok0 = bool(jax.device_get(check0(out[0])))
        log(f"{name} compile+verify {time.perf_counter()-t0:.0f}s "
            f"conv={okc} px0={ok0}")
        # "r1" entries cap the fixpoint at one round to TIME the
        # single-round cost on content that needs two (conv=False and
        # wrong pixels are expected there — ablation, not a decode)
        assert ("r1" in name) or (okc and ok0)
        nb = out.shape[0]
        mn, ts = _mins(
            lambda: int(jax.device_get(f(d, c)[0][0, 0])))
        print(f"{name}: min {mn*1e3:.0f} ms ({nb*n/1e6/mn:.1f} Mpx/s, "
              f"{mn*1e3/nb:.1f}/frame) all {[f'{t*1e3:.0f}' for t in ts]}",
              flush=True)

    # anchor: the production config (b16 flat, wide accumulate). Earlier
    # sweeps (PERF_NOTES): sum 126.6 vs wide 170 Mpx/s; chunked b32/b48
    # identical to flat b16; resolve scan cap B=2048 > 1024 > 512.
    f16w = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="wide"))
    bench("b16 flat wide", lambda d, c: f16w(d, c), dup(db, 2), dup(dc, 2))

    # exact-window accumulate: pltpu.roll re-bases the fine window at
    # row cb-2 exactly — 8 span rows instead of the 16-row aligned
    # window (half the compare/select/add volume, +2 rotates/subtile)
    f16x = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="xw"))
    bench("b16 flat xw", lambda d, c: f16x(d, c), dup(db, 2), dup(dc, 2))

    # round-structure ablation: max_rounds=1 peels the while_loop body
    # off entirely — on 2-round content (mixed) the anchor-minus-r1
    # difference IS the full second-round cost (anchored rebuild +
    # resolve + certificate + loop-carry traffic)
    f16r1 = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="xw", max_rounds=1))
    bench("b16 r1 xw", lambda d, c: f16r1(d, c), dup(db, 2), dup(dc, 2))

    # surgical-round kill switch: the full-round-loop-only cost of the
    # current build (isolates the surgical round's in-context price on
    # batches where some lane is not surgically fixable)
    if _selected("b16 nosurg"):
        v3._SURGICAL = False
        jax.clear_caches()
        fns = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="xw"))
        bench("b16 nosurg", lambda d, c: fns(d, c), dup(db, 2), dup(dc, 2))
        v3._SURGICAL = True
        jax.clear_caches()

    # straight-line two-round ablation (r5: the while_loop tax hunt):
    # round 1 + anchored rebuild + round 2 + cert + expand with NO
    # while_loop — on 2-round content the difference vs "b16 nosurg"
    # is pure loop-structure cost (carry materialization, masked-lane
    # updates, fusion barriers). WRONG pixels for 1-round content.
    if _selected("b16 sl2"):
        def sl2_one(d, c):
            m = d.shape[0]
            b = v3._scan_block_len(m)
            starts, cls, r6, d32, lit32, npix = v3._fields(d, c)
            from qoi_tpu.ops import scans as _sc
            w0i, pix_off = v3._initial_w(cls, r6, d32, lit32, None,
                                         npix=npix)
            w0 = jnp.where(starts, w0i, 0)
            base_p = v3._pos_major(
                (cls | (r6 << 9)).astype(jnp.int32), m, b)
            d32_p = v3._pos_major(d32, m, b)
            lit32_p = v3._pos_major(lit32, m, b)
            px1, _, _ = v3._resolve_p(base_p, d32_p, lit32_p, w0, m, b)
            w1 = jnp.where(starts, v3._anchored_w(cls, r6, d32, px1), 0)
            px2, _, _ = v3._resolve_p(base_p, d32_p, lit32_p, w1, m, b)
            true_w = jnp.where(starts, v3._hash_packed(px2), 0)
            bad = jnp.sum((true_w != w1).astype(jnp.int32))
            out = v3._expand_packed(starts, px2, pix_off, npc,
                                    use_kernel=not _MINI)
            return out, bad == 0, jnp.int32(2)

        fsl = jax.jit(lambda d, c: jax.vmap(sl2_one)(d, c))
        bench("b16 sl2", lambda d, c: fsl(d, c), dup(db, 2), dup(dc, 2))

    # fused in-kernel cumsum (accum="xwf"): the global
    # jnp.cumsum(landed) + seed folds into the expand grid via an SMEM
    # carry + per-subtile Hillis-Steele lane prefix — kills the batched
    # XLA cumsum (~2 ms/frame of log-shifted passes) and its HBM plane
    f16f = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="xwf" if not _MINI else "wide"))
    bench("b16 flat xwf", lambda d, c: f16f(d, c), dup(db, 2), dup(dc, 2))

    # xw at bigger tiles, sub=128: under xw the accumulate is
    # SPAN-bound (sub-only), so tile growth now only cuts grid steps —
    # the r4 t2048/t4096 closures were measured under accum="wide"
    for et, enb in ((2048, 2), (2048, 4), (4096, 4)):
        v3._EXPAND_TILE, v3._EXPAND_NBLOCKS = et, enb
        jax.clear_caches()
        fxt = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="xw"))
        bench(f"b16 xw t{et} nb{enb}", lambda d, c, f=fxt: f(d, c),
              dup(db, 2), dup(dc, 2))
    v3._EXPAND_TILE, v3._EXPAND_NBLOCKS = 1024, 2
    jax.clear_caches()

    # paired po|d DMA blocks: one (2*blk, 128) block per window block
    # halves per-step DMA issues (the expand grid's ~5 ms/frame is
    # per-step overhead, not bandwidth)
    if _selected("b16 pair"):
        from qoi_tpu.kernels import expand as kexp
        kexp._PAIR_DMA = True
        jax.clear_caches()
        fpr = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="xw"))
        bench("b16 pair", lambda d, c: fpr(d, c), dup(db, 2), dup(dc, 2))
        kexp._PAIR_DMA = False
        jax.clear_caches()

    # prefetched per-subtile window anchors: one XLA-side searchsorted
    # replaces the kernel's broadcast compare + ~64.8k narrow scalar
    # extractions per frame; packed 4x8-bit SMEM table
    if _selected("b16 panch"):
        from qoi_tpu.kernels import expand as kexpa
        old_panch = kexpa._PREF_ANCHORS
        kexpa._PREF_ANCHORS = not old_panch  # sweep the NON-default form
        jax.clear_caches()
        fpa = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="xw"))
        bench(f"b16 panch={not old_panch}", lambda d, c: fpa(d, c),
              dup(db, 2), dup(dc, 2))
        kexpa._PREF_ANCHORS = old_panch
        jax.clear_caches()

    # pass-3 structure: "scan" = the original numeric re-scan (r3
    # production), "vector" (the new default, in f16w above) = pass-1
    # symbolic px entries + one fused SWAR application of the pass-2
    # entry states — no second sequential scan
    f16s = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="wide", apply="scan"))
    bench("b16 scanapply", lambda d, c: f16s(d, c), dup(db, 2), dup(dc, 2))

    # dyn accumulate in-context: photo content is ~1.8 B/px, so the
    # data-sized fori window (~1 group of 8 rows) should beat the
    # worst-case-sized static 16-row window if the loop overhead allows
    f16y = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="dyn"))
    bench("b16 flat dyn", lambda d, c: f16y(d, c), dup(db, 2), dup(dc, 2))

    # dense expansion: chunk-compact the (pix_off, px) rows (2-plane
    # VMEM slide, decode_v3._compact_chunks) and run the kernel's dense
    # geometry (>= 1 px/record: 4x less DMA per step, 4x fewer
    # accumulate ops per px at sub=512)
    f16d = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="wide", dense=True))
    bench("b16 dense", lambda d, c: f16d(d, c), dup(db, 2), dup(dc, 2))

    # phase ablations (checksum-only, b16 vmapped): where the decode
    # frame goes — fields+w0 scans, the symbolic resolve, run expansion
    from qoi_tpu.ops import scans as qscans

    def abl_one(phase):
        def one(d, c):
            if phase == "starts":
                # the FSM tokenizer scan alone (fields sub-phase):
                # blocked_scan of ~20-op base-8 map compositions
                from qoi_tpu.ops import fsm as qfsm
                st = qfsm.chunk_starts(d, c)
                return jnp.sum(st.astype(jnp.int32))
            starts, cls, r6, d32, lit32, npix = v3._fields(d, c)
            if phase == "classify":
                # starts + the elementwise class/delta/literal extraction
                # (no _initial_w affine scan, no pix_off cumsum)
                return (jnp.sum(cls) + jnp.sum(d32.view(jnp.int32))
                        + jnp.sum(lit32.view(jnp.int32)) + jnp.sum(npix))
            pix_off = qscans.exclusive_cumsum(npix)
            w0 = jnp.where(starts, v3._initial_w(cls, r6, d32, lit32), 0)
            if phase == "fields":
                return (jnp.sum(w0) + jnp.sum(pix_off) + jnp.sum(cls)
                        + jnp.sum(d32.view(jnp.int32)))
            m = d.shape[0]
            b = v3._scan_block_len(m)
            if phase in ("p1", "p12"):
                # resolve internals: pass 1 (the vmapped B-step scan)
                # alone, then + pass 2 (block-map compose) — the
                # difference to "resolve" is pass 3 (SWAR apply)
                nb = m // b
                meta = (cls | (w0 << 3) | (r6 << 9)).astype(jnp.int32)
                pm = lambda x: x.reshape(nb, b).T
                root, val, proot, pval = v3._block_maps(
                    pm(meta), pm(d32), pm(lit32), nb, b, emit_px=True)
                cs = (jnp.sum(root.view(jnp.int32))
                      + jnp.sum(val.view(jnp.int32))
                      + jnp.sum(proot.view(jnp.int32))
                      + jnp.sum(pval.view(jnp.int32)))
                if phase == "p12":
                    entry, exit65 = v3._compose_entry_states(
                        root, val, nb, None, return_exit=True)
                    cs = (cs + jnp.sum(entry.view(jnp.int32))
                          + jnp.sum(exit65.view(jnp.int32)))
                return cs
            px, exit65 = v3._resolve(cls, r6, w0, d32, lit32, m, b)
            if phase.startswith("compact"):
                # + chunk compaction (decode_v3._compact_chunks), with
                # internal stop points: the r3 dense-expansion loss was
                # +45 ms/frame here (hardware r4: abl compact 61.2 vs
                # abl resolve 16.1) — find which piece (the m-length
                # cumsum, the event/aux build, the vmapped 2-plane VMEM
                # slide, or the assemble scatters)
                outs = v3._compact_chunks(starts, pix_off, px,
                                          interpret=_MINI,
                                          stop=phase.partition("/")[2])
                return (sum(jnp.sum(o.astype(jnp.int32)) for o in outs)
                        + jnp.sum(px.view(jnp.int32)))
            return (jnp.sum(px.view(jnp.int32))
                    + jnp.sum(exit65.view(jnp.int32)))
        return jax.jit(lambda dd, cc: jax.vmap(one)(dd, cc))

    for phase in ("starts", "classify", "fields", "p1", "p12", "resolve",
                  "compact/cumsum", "compact/events", "compact/slide",
                  "compact"):
        if not _selected("abl " + phase):
            continue
        fa = abl_one(phase)
        d2, c2 = dup(db, 2), dup(dc, 2)
        out = fa(d2, c2)  # compile
        int(jax.device_get(out[0]))
        mn, ts = _mins(lambda: int(jax.device_get(fa(d2, c2)[0])))
        print(f"abl {phase}: min {mn*1e3:.0f} ms "
              f"({2*len(streams)*n/1e6/mn:.1f} Mpx/s, "
              f"{mn*1e3/(2*len(streams)):.1f}/frame) "
              f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    # wide-kernel noop ablation IN-CONTEXT (checksum only, wrong pixels
    # by design): full decode + expand driver prep + grid/DMA/anchors,
    # accumulate dropped — the honest in-context split of the expand
    # phase into kernel-body vs everything-else
    if _selected("b16 wnoop"):
        fno = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="wnoop" if not _MINI else "wide"))
        d2, c2 = dup(db, 2), dup(dc, 2)
        t0 = time.perf_counter()
        int(jax.device_get(fno(d2, c2)[0][0, 0]))
        log(f"b16 wnoop compile {time.perf_counter()-t0:.0f}s")
        mn, ts = _mins(lambda: int(jax.device_get(fno(d2, c2)[0][0, 0])))
        print(f"b16 wnoop: min {mn*1e3:.0f} ms "
              f"({2*len(streams)*n/1e6/mn:.1f} Mpx/s, "
              f"{mn*1e3/(2*len(streams)):.1f}/frame) "
              f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)

    # CLOSED sweeps (hardware, see PERF_NOTES): unroll 1 best (4/8 lose
    # 10/25%), nblocks=4 neutral at tile 1024, etile 2048/4096 alone
    # lose ~1-3% (nb2 doubles the window rows), b32 chunked16 +1.5%
    # (not worth doubling the batch), dense expansion loses 2.1x
    # (vmapped scatter catastrophe + the acc-width invariance).

    # combined expand-geometry sweep: bigger tiles cut the grid-step
    # count (~8100 steps/frame at 1024) while nblocks>2 keeps the DMA
    # window rows small — tile 2048/nb4 has the SAME 128-row window as
    # the production 1024/nb2 with half the steps; 4096/nb7 also halves
    # per-px DMA (56 vs 128 B/px)
    for etile, nbl in ((2048, 4), (2048, 7), (4096, 7)):
        v3._EXPAND_TILE, v3._EXPAND_NBLOCKS = etile, nbl
        jax.clear_caches()
        fe = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
            accum="wide"))
        bench(f"b16 t{etile} nb{nbl}", lambda d, c, f=fe: f(d, c),
              dup(db, 2), dup(dc, 2))
    v3._EXPAND_TILE, v3._EXPAND_NBLOCKS = 1024, 2
    jax.clear_caches()

    # resolve scan-cap re-sweep under the r4 balance (vectorized pass 3
    # + cheaper compose may have moved the r3 optimum of 8192)
    for bmax in (4096, 16384):
        v3._SCAN_B_MAX = bmax
        jax.clear_caches()
        fb = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI))
        bench(f"b16 B{bmax}", lambda d, c, f=fb: f(d, c),
              dup(db, 2), dup(dc, 2))
    v3._SCAN_B_MAX = 8192
    jax.clear_caches()

    # xw wide-subtile sweep: span grows sublinearly in sub (13 rows per
    # 256 px, 23 per 512 vs 8 per 128), so per-px accumulate ops fall
    # 19%/43% — but the lane layout needs tile//sub % 8 == 0, i.e.
    # bigger tiles (which lost at sub=128 as pure step-count changes)
    for et, es, enb in ((2048, 256, 4), (4096, 512, 4)):
        v3._EXPAND_TILE, v3._EXPAND_SUB, v3._EXPAND_NBLOCKS = et, es, enb
        jax.clear_caches()
        fs = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI))
        bench(f"b16 xw s{es} t{et}", lambda d, c, f=fs: f(d, c),
              dup(db, 2), dup(dc, 2))
    v3._EXPAND_TILE, v3._EXPAND_SUB, v3._EXPAND_NBLOCKS = 1024, 128, 2
    jax.clear_caches()

    # blocked_scan block-size sweep: block == the lax.scan step count
    # (latency-bound, ~1 us/step) while lane width nb = m/block sets
    # per-step compute — the 512 default was never swept in context
    from qoi_tpu.ops import scans as qsc0
    for blk in (128, 256, 1024):
        qsc0._BLOCK = blk
        jax.clear_caches()
        fbl = jax.jit(functools.partial(
            v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI))
        bench(f"b16 sblk{blk}", lambda d, c, f=fbl: f(d, c),
              dup(db, 2), dup(dc, 2))
    qsc0._BLOCK = 512
    jax.clear_caches()

    # _BLOCKED_CUM in-context A/B: the standalone probe says XLA's
    # native batched cumsum is FINE (1.9 vs blocked 2.3 ms/frame) —
    # flip the flag to see the in-context decode delta
    from qoi_tpu.ops import scans as qsc
    qsc._BLOCKED_CUM = False
    jax.clear_caches()
    fxc = jax.jit(functools.partial(
        v3._decode_device_batch, n_px_cap=npc, use_kernel=not _MINI,
        accum="wide"))
    bench("b16 xla-cumsum", lambda d, c: fxc(d, c), dup(db, 2), dup(dc, 2))
    qsc._BLOCKED_CUM = True
    jax.clear_caches()


def cmd_expand():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from qoi_tpu.kernels import expand

    rng = np.random.default_rng(7)
    m = _EXPAND_M
    cap = m // 2 + m // 16
    lens = rng.choice([1, 1, 1, 2, 2, 4, 5], size=m // 2)
    sp = np.cumsum(lens) - lens[0]
    sp = sp[sp < m]
    npix = np.zeros(m, np.int64)
    npix[sp] = np.where(rng.random(len(sp)) < 0.03,
                        rng.integers(2, 63, len(sp)), 1)
    po = np.concatenate([[0], np.cumsum(npix)[:-1]]).astype(np.int32)
    px = np.zeros(m, np.uint32)
    px[sp] = rng.integers(0, 1 << 32, len(sp),
                          dtype=np.uint64).astype(np.uint32)
    starts = np.zeros(m, bool)
    starts[sp] = True
    px = np.maximum.accumulate(np.where(starts, px, 0)).astype(np.uint32)
    dpo = jax.device_put(jnp.asarray(po))
    dpx = jax.device_put(jnp.asarray(px))
    _floor_probe(jax, jnp, dpo)

    want = None
    for tile, sub, acc, nbl in (
            (1024, 128, "sum", 2), (1024, 128, "noop", 2),
            (1024, 128, "wide", 2), (2048, 128, "wide", 2),
            (2048, 256, "wide", 2), (4096, 512, "wide", 2),
            # multi-block DMA windows: same coverage envelope, less HBM
            # traffic per grid step (4x16 rows = half of 2x64; 7x8 = 56)
            (1024, 128, "wide", 4), (1024, 128, "noop", 4),
            (1024, 128, "wide", 7), (1024, 128, "dyn", 4),
            (2048, 128, "wide", 4),
            # exact-window + fused-cumsum variants (r4)
            (1024, 128, "xw", 2), (1024, 128, "xwf", 2),
            (2048, 128, "xw", 2), (2048, 128, "xwf", 2)):
        f = jax.jit(lambda p, x, t=tile, sb=sub, a=acc, nb=nbl:
                    expand.expand_px(p, x, cap, tile=t, sub=sb, accum=a,
                                     nblocks=nb, interpret=_MINI))
        t0 = time.perf_counter()
        out = f(dpo, dpx)
        s = int(jax.device_get(jnp.sum(out.view(jnp.int32))))
        log(f"tile={tile}/{sub}/{acc}/nb{nbl} compile+run {time.perf_counter()-t0:.0f}s")
        if acc != "noop":  # noop is the DMA/anchor ablation, wrong by design
            if want is None:
                xla = jax.jit(lambda p, x: expand.expand_px_xla(p, x, cap))
                assert bool(jax.device_get(jnp.all(out == xla(dpo, dpx)))), \
                    "kernel != XLA reference"
                want = s
            assert s == want, f"tile={tile}/{sub}/{acc}/nb{nbl} checksum mismatch"
        mn, ts = _mins(
            lambda: int(jax.device_get(f(dpo, dpx)[:1].view(jnp.int32)[0])))
        print(f"tile={tile}/{sub}/{acc}/nb{nbl}: min {mn*1e3:.1f} ms "
              f"all {[f'{t*1e3:.0f}' for t in ts]}", flush=True)


def main():
    global W, H, REPS
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("what", choices=["encode", "decode", "expand", "pack"])
    ap.add_argument("--only", default="",
                    help="comma-separated substrings: run only matching "
                         "variants (encode/decode bench names)")
    ap.add_argument("--mini", action="store_true",
                    help="tiny shapes + forced CPU: smoke-tests every "
                         "variant end-to-end without touching the TPU")
    ap.add_argument("--content", default="photo",
                    help="testimages generator for the decode streams "
                         "(photo/mixed/...)")
    args = ap.parse_args()
    global _ONLY
    _ONLY = [t for t in args.only.split(",") if t]
    if args.mini:
        global _EXPAND_M
        import jax
        jax.config.update("jax_platforms", "cpu")
        W, H, REPS = 320, 192, 2
        _EXPAND_M = 1 << 17
        globals()['_MINI'] = True
    import jax

    from qoi_tpu.utils import profiling
    profiling.enable_compile_cache()  # env vars alone are swallowed here
    log(f"device: {jax.devices()[0]}")
    if args.what == "decode":
        cmd_decode(content=args.content)
    else:
        {"encode": cmd_encode, "pack": cmd_pack,
         "expand": cmd_expand}[args.what]()


if __name__ == "__main__":
    main()
