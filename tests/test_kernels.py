"""Pallas kernels vs the XLA reference stages (interpret mode on CPU —
SURVEY §4: kernel-level tests in interpret mode vs jnp implementations)."""
import numpy as np
import pytest

import qoi_tpu.format as fmt
from qoi_tpu.models import pipeline
from qoi_tpu.utils import testimages


def _stage_ref(px4, n_valid):
    import jax.numpy as jnp

    chunks = pipeline.encode_stage_chunks(jnp.asarray(px4), jnp.int32(n_valid))
    # pipeline staging is byte-plane-major (6, N); the kernel emits (N, 6)
    return np.asarray(chunks.staging).T, np.asarray(chunks.lens)


def _stage_pallas(px4, n_valid, block=256):
    import jax.numpy as jnp

    from qoi_tpu.kernels import encode_stage

    stag, lens = encode_stage.encode_stage_pallas(
        jnp.asarray(px4), n_valid, block=block, interpret=True)
    return np.asarray(stag), np.asarray(lens)[:, 0]


def _check(img, block=256):
    h, w, ch = img.shape
    desc = fmt.StreamDesc(w, h, ch)
    px4 = pipeline.force_rgba(img, desc)
    n = px4.shape[0]
    cap = -(-n // block) * block
    padded = np.zeros((cap, 4), np.uint8)
    padded[:n] = px4

    want_s, want_l = _stage_ref(padded, n)
    got_s, got_l = _stage_pallas(padded, n, block)

    np.testing.assert_array_equal(got_l, want_l)
    # compare staged bytes only within each record's length (bytes beyond
    # lens are ignored by compaction and differ by design)
    col = np.arange(6)[None, :]
    mask = col < want_l[:, None]
    np.testing.assert_array_equal(
        np.where(mask, got_s, 0), np.where(mask, want_s, 0))


@pytest.mark.parametrize("name", ["gradient", "palette", "mixed", "flat_70px",
                                  "noise_small", "runs_caps", "seed_run",
                                  "wraparound", "alpha_toggle"])
def test_fused_staging_edge_cases(name):
    _check(testimages.edge_case_suite(4)[name])


def test_fused_staging_rgb():
    _check(testimages.mixed(64, 20, 3))


def test_fused_staging_multiblock_runs():
    """Runs crossing kernel block boundaries exercise the SMEM run carry."""
    _check(testimages.flat(300, 4, 4), block=256)


def test_fused_staging_table_carry():
    """Palette repeats crossing blocks exercise the VMEM table carry."""
    _check(testimages.palette(300, 4, 4, colors=9, seed=5), block=256)


def test_fused_staging_padding_tail():
    _check(testimages.noise(97, 5, 4, seed=8), block=256)


# ---------------------------------------------------------------------------
# Run-expansion kernel (kernels/expand.py) vs its XLA telescoping reference
# ---------------------------------------------------------------------------

def _synth_records(m, seed, max_run=62):
    """Per-byte (pix_off, px32) records mimicking decode output: chunks of
    1-5 bytes, each emitting 1 px except 1-byte chunks which may RUN."""
    rng = np.random.default_rng(seed)
    npix = np.zeros(m, np.int64)
    px = np.zeros(m, np.uint32)
    i = 0
    while i < m - 5:
        nbytes = int(rng.integers(1, 6))
        n = int(rng.integers(1, max_run + 1)) if nbytes == 1 else 1
        npix[i] = n
        px[i:i + nbytes] = np.uint32(rng.integers(0, 2**32))
        i += nbytes
    px[i:] = px[i - 1] if i else 0
    pix_off = (np.cumsum(npix) - npix).astype(np.int32)
    return pix_off, px


@pytest.mark.parametrize("accum", ["sum", "wide", "dyn", "xw", "xwf"])
@pytest.mark.parametrize("m,cap,seed", [
    (600, 512, 0),        # truncation: offsets overflow the cap
    (6000, 4096, 1),
    (100, 2048, 2),       # short stream: tail repeats the last chunk px
    (70000, 65536, 3),
])
def test_expand_kernel_matches_xla(m, cap, seed, accum):
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    pix_off, px = _synth_records(m, seed)
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), cap, interpret=True,
        accum=accum))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), cap))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("variant", ["pair", "panch"])
@pytest.mark.parametrize("m,cap,seed", [
    (600, 512, 0), (6000, 4096, 1), (70000, 65536, 3)])
def test_expand_kernel_variants_match_xla(m, cap, seed, variant):
    """r5 kernel options must be bit-identical to the XLA oracle:
    `pair` = one (2*blk, 128) DMA block carrying both planes per window
    block; `panch` = packed prefetched per-subtile window anchors."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    pix_off, px = _synth_records(m, seed)
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), cap, interpret=True,
        accum="xw", **{variant: True}))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), cap))
    np.testing.assert_array_equal(got, want)


def test_expand_kernel_fused_cumsum_vmap_resets_carry():
    """accum="xwf" keeps its running prefix in SMEM scratch across grid
    steps; under vmap the batch axis is the OUTERMOST grid dim, so the
    t == 0 re-seed must isolate streams — a stale carry from stream 0
    would shift every pixel of stream 1."""
    import jax
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    po1, px1 = _synth_records(6000, 21)
    po2, px2 = _synth_records(6000, 22)
    pos = jnp.stack([jnp.asarray(po1), jnp.asarray(po2)])
    pxs = jnp.stack([jnp.asarray(px1), jnp.asarray(px2)])
    got = np.asarray(jax.vmap(lambda p, x: expand.expand_px(
        p, x, 4096, interpret=True, accum="xwf"))(pos, pxs))
    want = np.asarray(jax.vmap(lambda p, x: expand.expand_px_xla(
        p, x, 4096))(pos, pxs))
    np.testing.assert_array_equal(got, want)


def test_expand_kernel_fused_cumsum_custom_seed():
    """xwf folds the seed into the carry init (not a post-pass add)."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    pix_off, px = _synth_records(6000, 23)
    seed = np.uint32(0xDEADBEEF)
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), 4096, interpret=True,
        accum="xwf", seed32=seed))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), 4096, seed32=seed))
    np.testing.assert_array_equal(got, want)


def test_expand_kernel_all_singles():
    """No runs at all: every chunk 5 bytes (worst-case window density)."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    pix_off, px = _synth_records(20000, 7, max_run=1)
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), 16384, interpret=True))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), 16384))
    np.testing.assert_array_equal(got, want)


def _all_one_byte_chunks(m, run_len):
    """Every byte a 1-byte chunk emitting run_len px: the max-sparsity
    geometry (62-runs advance offsets 62 px/byte — anchors jump rows)."""
    npix = np.full(m, run_len, np.int64)
    rng = np.random.default_rng(run_len)
    px = rng.integers(0, 2**32, m, dtype=np.uint64).astype(np.uint32)
    pix_off = (np.cumsum(npix) - npix).astype(np.int32)
    return pix_off, px


def test_expand_kernel_big_tile():
    """tile=2048 exercises the derived-block-size path (brows=256, wider
    anchor column, bigger scratch)."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    pix_off, px = _synth_records(60000, 13)
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), 32768, interpret=True,
        tile=2048))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), 32768))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("geometry", [
    "max_runs", "alternating", "dot_dense",
    "max_runs_dyn", "alternating_dyn", "alternating_wide",
    "max_runs_xw", "alternating_xw"])
def test_expand_kernel_adversarial_geometry(geometry):
    """Anchor/window edge geometries for the vectorized in-kernel anchor
    path: max-sparsity (every byte a 62-run: each output subtile's window
    sits entirely in 1-3 rows far apart), alternation (runs next to
    5-byte literal bursts: anchor rows shift abruptly mid-tile), and the
    dot accumulate on dense content."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    if geometry.startswith("max_runs"):
        pix_off, px = _all_one_byte_chunks(4096, 62)
        cap, accum = 65536, geometry[9:] or "sum"
    elif geometry.startswith("alternating"):
        rng = np.random.default_rng(5)
        npix = np.zeros(30000, np.int64)
        px = np.zeros(30000, np.uint32)
        i = 0
        while i < 30000 - 6:
            if rng.random() < 0.5:   # a 62-run
                npix[i] = 62
                px[i] = np.uint32(rng.integers(0, 2**32))
                i += 1
            else:                    # burst of 5-byte RGBA literals
                for _ in range(int(rng.integers(1, 9))):
                    if i >= 30000 - 6:
                        break
                    npix[i] = 1
                    px[i:i + 5] = np.uint32(rng.integers(0, 2**32))
                    i += 5
        px[i:] = px[i - 1]
        pix_off = (np.cumsum(npix) - npix).astype(np.int32)
        cap, accum = 32768, geometry[12:] or "sum"
    else:
        pix_off, px = _synth_records(20000, 11, max_run=1)
        cap, accum = 16384, "dot"
    got = np.asarray(expand.expand_px(
        jnp.asarray(pix_off), jnp.asarray(px), cap, interpret=True,
        accum=accum))
    want = np.asarray(expand.expand_px_xla(
        jnp.asarray(pix_off), jnp.asarray(px), cap))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nblocks,accum", [
    (4, "wide"), (4, "dyn"), (7, "wide")])
def test_expand_kernel_multiblock_windows(nblocks, accum):
    """Multi-block DMA windows (4x16 / 7x8 rows instead of 2x64) must be
    exact on every geometry the 2-block shape covers: mixed chunks,
    worst-case 5 B/px density, and max-sparsity 62-runs."""
    import jax.numpy as jnp

    from qoi_tpu.kernels import expand

    for pix_off, px, cap in [
            _synth_records(60000, 17) + (32768,),
            _synth_records(20000, 7, max_run=1) + (16384,),
            _all_one_byte_chunks(2048, 62) + (32768,)]:
        got = np.asarray(expand.expand_px(
            jnp.asarray(pix_off), jnp.asarray(px), cap, interpret=True,
            accum=accum, nblocks=nblocks))
        want = np.asarray(expand.expand_px_xla(
            jnp.asarray(pix_off), jnp.asarray(px), cap))
        np.testing.assert_array_equal(got, want)
