"""Fully-fused histogram kernels: stage image -> histogram in one pass.

These fuse three stages that the XLA path materializes in HBM (bin indices,
break/return-survival masks, weights) into the factorized-one-hot MXU
accumulation of ``histogram.py``:

* ``noise_hist_fused``: sdev image -> 2048-bin noise histogram with the
  per-tile-column ``break`` semantics (shaders/noise_hist.comp:21-47);
* ``grad_hist_fused``: reconstructed image + relevance -> 1024-bin gradation
  histogram with the whole-tile ``return`` semantics
  (shaders/gradation_histogram.comp:20-33).

The within-16-lane-group prefix/total ORs that encode the scan-abort
semantics are computed with log-step masked lane rolls (4 x roll+or on the
VPU), never leaving VMEM.  HBM traffic drops to exactly one read of the
input image(s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .histogram import _factor

I32 = jnp.int32
F32 = jnp.float32


def _lane_pos(shape, tile: int):
    """Lane index within its 16-lane group, per element."""
    return jax.lax.broadcasted_iota(I32, shape, 1) % tile


def _masked_roll_or(p, k, lane_in_group):
    """p | (p shifted right by k lanes), masked so groups don't leak."""
    shifted = pltpu.roll(p, k, 1)
    keep = (lane_in_group >= k).astype(p.dtype)
    return p | (shifted * keep)


def _prefix_or_in_group(z, tile: int):
    """Inclusive prefix-OR along lanes within 16-lane groups (int32 0/1)."""
    lane = _lane_pos(z.shape, tile)
    p = z
    k = 1
    while k < tile:
        p = _masked_roll_or(p, k, lane)
        k *= 2
    return p


def _total_or_in_group(z, tile: int):
    """Group-wide OR broadcast to every lane of the group."""
    lane = _lane_pos(z.shape, tile)
    p = z
    k = 1
    while k < tile:
        w = p.shape[1]
        shifted_r = pltpu.roll(p, k, 1)
        keep_r = (lane >= k).astype(p.dtype)
        shifted_l = pltpu.roll(p, w - k, 1)  # roll left by k (shift >= 0 only)
        keep_l = (lane < tile - k).astype(p.dtype)
        p = p | (shifted_r * keep_r) | (shifted_l * keep_l)
        k *= 2
    return p


def _tree_sum(parts):
    """Balanced pairwise sum.  All inputs/partials are exact f32 integers
    below 2^24 (caller-enforced), so every intermediate is exact and the
    result is bit-identical for ANY association order."""
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _accumulate_fact(bins, w, out_ref, C: int, F: int,
                     max_weight: int = 100):
    """Per-row factorized one-hot accumulation (see histogram.py).

    Counts must stay EXACT integers (the GLSL histogram is a uint32 atomic):
    each per-row f32 matmul partial is bounded by K * max_weight < 2^24
    and therefore exact.  ``max_weight`` MUST bound every caller's weights
    (noise: w in {0, 1}; gradation/CLAHE: trunc(relevant * 100) <= 100) --
    the group sizing below depends on it; a larger-weight caller must pass
    its own bound or counts silently overflow the exact-f32 window.  Rows are INDEPENDENT dots whose f32 partials are
    tree-summed in groups sized so every f32 partial sum stays < 2^24
    (exact, order-free), with int32 accumulation across groups -- unlike the
    original serial ``acc += part`` chain this has no MXU->VPU dependency
    per row, so Mosaic pipelines the one-hot builds against the dots
    (measured 2-3x on the hist kernels, scripts/exp_analysis.py).
    (Grouping rows into wider contractions via lane-concat is rejected by
    Mosaic: "offset mismatch on non-concat dimension".)
    """
    rows, width = bins.shape
    # Rank-3 batched formulation: ALL rows' one-hots built as single
    # [rows, C|F, width] tensors and contracted in one batched dot (batch =
    # rows, contraction = width) -- fewer, larger Mosaic ops than the
    # per-row loop (measured 0.451 -> 0.426 ms on the 3072 noise hist,
    # scripts/exp_hist3.py), identical math per row so counts stay
    # bit-identical.
    iota_c = jax.lax.broadcasted_iota(I32, (rows, C, 1), 1)
    iota_f = jax.lax.broadcasted_iota(I32, (rows, F, 1), 1)
    cb = (bins // F).reshape(rows, 1, width)
    fb = (bins % F).reshape(rows, 1, width)
    wr = w.reshape(rows, 1, width)
    # f32 one-hots, NO bf16 casts: every value (0/1 masks, integer
    # weights <= 100) is exactly representable in bf16, so the MXU's
    # bf16-pass f32 matmul computes exact products with f32
    # accumulation -- bit-identical counts, and the VPU drops the
    # (C+F)*width cast ops per row that dominated the kernel
    a_t = jnp.where(cb == iota_c, wr, 0.0)
    f_t = (fb == iota_f).astype(F32)
    parts = jax.lax.dot_general(
        a_t, f_t, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=F32)
    # group * width * max_weight < 2^24 keeps every f32 partial exact;
    # int32 accumulation across groups (the GLSL histogram is uint32)
    grp = max(1, (1 << 24) // (width * max_weight + 1))
    acc = jnp.zeros(out_ref.shape, I32)
    for s in range(0, rows, grp):
        acc = acc + _tree_sum(
            [parts[r] for r in range(s, min(s + grp, rows))]).astype(I32)
    out_ref[:] += acc


# ----------------------------------------------------------------------
# noise histogram
# ----------------------------------------------------------------------

def _noise_kernel(sdev_ref, out_ref, *, C, F, n_bins, tile, max_noise):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = sdev_ref[:]
    adjusted = v / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((v == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = _prefix_or_in_group(brk, tile)
    w = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_fact(bins, w, out_ref, C, F)


@functools.partial(jax.jit,
                   static_argnames=("n_bins", "tile", "max_noise", "rows",
                                    "interpret"))
def noise_hist_fused(sdev_cov: jnp.ndarray, n_bins: int = 2048,
                     tile: int = 16, max_noise: float = 0.1,
                     rows: int = 16, interpret: bool = False) -> jnp.ndarray:
    """sdev (already coverage-sliced/padded, [cov, cov]) -> histogram."""
    C, F, _ = _factor(n_bins)
    cov = sdev_cov.shape[-1]
    r = min(rows, sdev_cov.shape[-2])
    assert sdev_cov.shape[-2] % r == 0
    return pl.pallas_call(
        functools.partial(_noise_kernel, C=C, F=F, n_bins=n_bins, tile=tile,
                          max_noise=max_noise),
        grid=(sdev_cov.shape[-2] // r,),
        in_specs=[pl.BlockSpec((r, cov), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), I32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * sdev_cov.size * C * F,
            bytes_accessed=sdev_cov.size * 4, transcendentals=0),
    )(sdev_cov).reshape(-1)[:n_bins]


def _noise_multi_kernel(v_ref, hist_ref, mb_ref, *, C, F, n_bins, tile,
                        max_noise, last_k):
    """One (image, row-block) grid step of the multi-level kernel: noise
    histogram accumulation (identical math to ``_noise_kernel``) plus the
    first-max argmax (shaders/img_histogram_max.comp:17-31) computed
    in-kernel on the final row-block of each image."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    v = v_ref[0]
    adjusted = v / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((v == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = _prefix_or_in_group(brk, tile)
    w = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_fact(bins, w, hist_ref, C, F)

    @pl.when(k == last_k)
    def _():
        h = hist_ref[0]
        # bin b lives at (b // F, b % F): flat row-major index == bin index.
        # Strict > keeps the FIRST maximum == the min flat index attaining
        # the max; an all-zero histogram yields bin 0 (both as jnp.argmax).
        flat = (jax.lax.broadcasted_iota(I32, (C, F), 0) * F
                + jax.lax.broadcasted_iota(I32, (C, F), 1))
        mb_ref[pl.program_id(0), 0] = jnp.min(
            jnp.where(h == jnp.max(h), flat, n_bins))


@functools.partial(jax.jit, static_argnames=("n_bins", "tile", "max_noise",
                                             "rows", "interpret"))
def noise_hist_argmax_multi(stacked: jnp.ndarray, n_bins: int = 2048,
                            tile: int = 16, max_noise: float = 0.1,
                            rows: int = 128, interpret: bool = False):
    """ALL analysis levels' noise histograms + argmaxes in ONE kernel.

    ``stacked`` is [L, cov, cov]: each level's coverage view zero-padded to
    the common cov (a multiple of ``tile``, so padded lanes form whole
    16-lane groups whose leading zero kills the tile-column scan, and padded
    rows are all-dead -- zero contribution, same as absent).  Returns
    (hists [L, n_bins] int32, max_bins [L] int32).  Replaces L separate
    hist kernels + L argmax dispatches (launch-overhead bound: 0.77 ms ->
    one kernel, scripts/exp_analysis.py).
    """
    L, covr, cov = stacked.shape
    assert covr % rows == 0 and cov % tile == 0
    C, F, padded = _factor(n_bins)
    assert padded == n_bins, "flat-index argmax needs an exact factorization"
    kb = covr // rows
    hists, mbs = pl.pallas_call(
        functools.partial(_noise_multi_kernel, C=C, F=F, n_bins=n_bins,
                          tile=tile, max_noise=max_noise, last_k=kb - 1),
        grid=(L, kb),
        in_specs=[pl.BlockSpec((1, rows, cov), lambda i, k: (i, k, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((1, C, F), lambda i, k: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # whole-array SMEM block (Mosaic requires block == array dims
            # for sub-(8,128) shapes); written at each image's last step
            pl.BlockSpec((L, 1), lambda i, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((L, C, F), I32),
                   jax.ShapeDtypeStruct((L, 1), I32)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * stacked.size * C * F,
            bytes_accessed=stacked.size * 4, transcendentals=0),
    )(stacked)
    return hists.reshape(L, C * F)[:, :n_bins], mbs[:, 0]


# ----------------------------------------------------------------------
# sdev + noise histogram in one pass
# ----------------------------------------------------------------------

def _sdev_noise_kernel(band_ref, top_ref, bot_ref, hist_ref, sdev_ref, *,
                       C, F, n_bins, tile, max_noise, n):
    """img_sdev (5x5 RMS, zero-pad borders, shaders/img_sdev.comp:15-29)
    computed in-kernel from the bandpass block, emitting BOTH the sdev image
    block and the noise-histogram accumulation (shaders/noise_hist.comp) --
    the sdev image is written once and never re-read for the histogram.

    The 2-row top/bottom halos arrive as separate pre-sliced strips (padded
    to 8 sublanes for the Mosaic block rule; only rows 0-1 are real).  Row
    taps are unit-stride sublane slices of the halo-extended block; column
    taps are masked lane rolls in the SAME m = 0..4 left-to-right order as
    ops/stats.py::img_sdev, so the f32 accumulation (and hence every bin
    decision) is bit-identical to the two-step path.
    """
    @pl.when(pl.program_id(0) == 0)
    def _():
        hist_ref[:] = jnp.zeros_like(hist_ref)

    band = band_ref[:]          # [R, n]
    ext = jnp.concatenate([top_ref[0:2], band, bot_ref[0:2]], axis=0)
    sq = ext * ext
    R = band.shape[0]
    tmp = (sq[0:R, :] + sq[1:R + 1, :] + sq[2:R + 2, :]
           + sq[3:R + 3, :] + sq[4:R + 4, :])
    col = jax.lax.broadcasted_iota(I32, tmp.shape, 1)

    def tap(m):
        d = m - 2
        if d < 0:
            return pltpu.roll(tmp, -d, 1) * (col >= -d).astype(F32)
        if d == 0:
            return tmp
        return pltpu.roll(tmp, n - d, 1) * (col < n - d).astype(F32)

    s = tap(0)
    for m in range(1, 5):
        s = s + tap(m)
    sdev = jnp.sqrt(s * F32(1.0 / 25.0))
    sdev_ref[:] = sdev

    adjusted = sdev / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((sdev == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = _prefix_or_in_group(brk, tile)
    w = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_fact(bins, w, hist_ref, C, F)


@functools.partial(jax.jit, static_argnames=("n_bins", "tile", "max_noise",
                                             "rows", "interpret"))
def sdev_noise_hist_fused(band: jnp.ndarray, n_bins: int = 2048,
                          tile: int = 16, max_noise: float = 0.1,
                          rows: int = 96, interpret: bool = False):
    """Bandpass level image [n, n] -> (noise histogram [n_bins], sdev [n, n]).

    Requires full histogram coverage (cov == n; callers fall back to the
    two-step path otherwise) and n divisible by ``rows``.
    """
    n = band.shape[-1]
    assert band.shape[-2] % rows == 0 and rows % 8 == 0
    grid = band.shape[-2] // rows
    C, F, _ = _factor(n_bins)
    z2 = jnp.zeros((2, n), band.dtype)
    # top halo strips: rows (i*rows - 2, i*rows - 1), zeros for i == 0;
    # padded to 8 sublanes per grid block (XLA fuses these slices into small
    # gathers -- no full-image copy)
    top = jnp.concatenate([z2, band[:-2]], axis=0
                          ).reshape(grid, rows, n)[:, :8].reshape(grid * 8, n)
    # bottom halo strips: rows ((i+1)*rows, (i+1)*rows + 1), zeros at the end
    bot = jnp.concatenate([band[rows:], jnp.zeros((rows, n), band.dtype)],
                          axis=0).reshape(grid, rows, n)[:, :8].reshape(grid * 8, n)
    hist, sdev = pl.pallas_call(
        functools.partial(_sdev_noise_kernel, C=C, F=F, n_bins=n_bins,
                          tile=tile, max_noise=max_noise, n=n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((C, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((C, F), I32),
                   jax.ShapeDtypeStruct(band.shape, band.dtype)),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * band.size * C * F, bytes_accessed=band.size * 8,
            transcendentals=band.size),
    )(band, top, bot)
    return hist.reshape(-1)[:n_bins], sdev


# ----------------------------------------------------------------------
# gradation histogram
# ----------------------------------------------------------------------

def _tile_alive(v, tile: int):
    """Survival mask for the gradation `return` semantics on a block of
    whole 16-row tiles: within each tile, a pixel at offset (m, n) survives
    iff no zero exists in any earlier tile column m' < m and none at rows
    <= n of its own column.  The cross-row prefix resets at tile boundaries."""
    zero = (v == 0.0).astype(I32)
    in_col_dead = _prefix_or_in_group(zero, tile)
    col_zero = _total_or_in_group(zero, tile)
    rows = v.shape[0]
    acc_rowwise = []
    run = jnp.zeros((1, v.shape[1]), I32)
    for m in range(rows):
        if m % tile == 0:
            run = jnp.zeros((1, v.shape[1]), I32)
        acc_rowwise.append(run)
        run = run | col_zero[m:m + 1, :]
    prev = jnp.concatenate(acc_rowwise, axis=0)
    return (1 - prev) * (1 - in_col_dead)


def _grad_kernel(v_ref, r_ref, out_ref, *, C, F, n_bins, tile):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = v_ref[:].astype(F32)  # [R, cov] -- R/16 full tile rows; the input
    rel = r_ref[:].astype(F32)  # may be bf16 (storage="bfloat16" mode)
    alive = _tile_alive(v, tile)

    bins = (v * F32(n_bins)).astype(I32)
    wgt = (rel * F32(100.0)).astype(I32).astype(F32)
    w = jnp.where((bins >= 0) & (bins < n_bins), wgt * alive.astype(F32), 0.0)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_fact(bins, w, out_ref, C, F)


def _grad_relevant_kernel(v_ref, norm_ref, wplane_ref, out_ref, *,
                          C, F, n_bins, tile, n_img, border, max_pixel):
    """grad_hist with the relevance mask computed in-kernel
    (shaders/img_relevant.comp:27-63 fused into gradation_histogram.comp):
    saves materializing the full-res relevance image in HBM.

    Everything derived from the CNR map alone (the ramp/solid range tests,
    the (cnr/top)^k ramp weight and its uint truncation) is block-constant
    over the nearest-upsample scale, so the caller precomputes ONE small
    weight plane: >= 0 -> the final integer weight (ramp blocks carry
    trunc(ramp_val*100), dead blocks 0), -1 -> solid block whose weight is
    the per-pixel intensity test (100 if norm <= max_pixel else 0).  Only
    the border and intensity tests remain per-pixel -- the in-kernel
    division/pow/casts of the original formulation measured ~0.2 ms at
    3072 (scripts/exp_ops.py: fused 0.710 vs 0.498 + separate relevance)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = v_ref[:].astype(F32)       # bf16 inputs upcast in-VMEM (the HBM
    norm = norm_ref[:].astype(F32)  # read stays half-width in bf16 mode)
    rows, cov = v.shape

    # ---- relevance weight (precomputed plane + per-pixel tests) ----
    row0 = pl.program_id(0) * rows
    r_idx = row0 + jax.lax.broadcasted_iota(I32, (rows, cov), 0)
    c_idx = jax.lax.broadcasted_iota(I32, (rows, cov), 1)
    # wplane_ref delivers this block's 8 pre-expanded plane rows
    # (lane-expanded and row-expanded on the host so the BlockSpec stays
    # 8-aligned).  Expand 8 -> rows in-kernel with exact sublane broadcasts.
    blk = wplane_ref[:]
    reps = rows // blk.shape[0]
    wp = jnp.concatenate(
        [jnp.broadcast_to(blk[j:j + 1, :], (reps, cov))
         for j in range(blk.shape[0])], axis=0)
    inb = ((r_idx > border) & (r_idx < n_img - border)
           & (c_idx > border) & (c_idx < n_img - border))
    wgt = jnp.where(wp >= 0.0, wp,
                    jnp.where(norm <= max_pixel, F32(100.0), F32(0.0)))
    wgt = jnp.where(inb, wgt, 0.0)

    # ---- gradation histogram semantics (as _grad_kernel) ----
    alive = _tile_alive(v, tile)

    bins = (v * F32(n_bins)).astype(I32)
    w = jnp.where((bins >= 0) & (bins < n_bins), wgt * alive.astype(F32), 0.0)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_fact(bins, w, out_ref, C, F)


@functools.partial(jax.jit, static_argnames=(
    "n_bins", "tile", "interpret", "n_img", "cnr_scale", "border",
    "cnr_low", "cnr_top", "cnr_max", "k_pow", "max_pixel"))
def grad_hist_relevant_fused(recon_cov: jnp.ndarray, normalized_cov: jnp.ndarray,
                             cnr: jnp.ndarray, *, n_img: int, cnr_scale: int,
                             border: int, cnr_low: float, cnr_top: float,
                             cnr_max: float, k_pow: float, max_pixel: float,
                             n_bins: int = 1024, tile: int = 16,
                             interpret: bool = False) -> jnp.ndarray:
    """Gradation histogram with in-kernel relevance; recon/normalized are
    coverage-padded [cov, cov], cnr is the small CNR map."""
    C, F, _ = _factor(n_bins)
    cov = recon_cov.shape[-1]
    assert recon_cov.shape[-2] % tile == 0
    rblk = next((r for r in (6 * tile, 3 * tile, 2 * tile, tile)
                 if recon_cov.shape[-2] % r == 0), tile)
    # ---- block-constant relevance weight plane on the SMALL CNR map ----
    # Identical arithmetic to the reference's per-pixel evaluation
    # (img_relevant.comp:27-63 + the uint(rel*100) truncation of
    # gradation_histogram.comp): nearest upsampling is an exact copy, so
    # computing on the small map then expanding is bit-identical.
    from ..noise import _pow_maybe_int
    c = cnr * jnp.float32(cnr_max)
    ramp = (c >= cnr_low) & (c <= cnr_top)
    solid = (c >= cnr_top) & (c <= cnr_max) & ~ramp  # ramp wins at c == top
    w_ramp = (_pow_maybe_int(c / jnp.float32(cnr_top), k_pow)
              * jnp.float32(100.0)).astype(jnp.int32).astype(F32)
    wplane = jnp.where(solid, F32(-1.0), jnp.where(ramp, w_ramp, F32(0.0)))
    # pre-expand along lanes, and along rows so its per-step block stays
    # 8-aligned (an MXU one-hot select is not bit-exact on v5e; callers
    # guarantee tile % scale == 0)
    wplane = jnp.repeat(wplane, cnr_scale, axis=-1)[..., :cov]
    pre = max((8 * cnr_scale) // tile, 1)
    wplane = jnp.repeat(wplane, pre, axis=-2)
    blk_rows = rblk * pre // cnr_scale
    kern = functools.partial(
        _grad_relevant_kernel, C=C, F=F, n_bins=n_bins, tile=tile,
        n_img=n_img, border=border, max_pixel=max_pixel)
    return pl.pallas_call(
        kern,
        grid=(recon_cov.shape[-2] // rblk,),
        in_specs=[
            pl.BlockSpec((rblk, cov), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, cov), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((blk_rows, cov), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), I32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * recon_cov.size * C * F,
            bytes_accessed=recon_cov.size * 8, transcendentals=recon_cov.size),
    )(recon_cov, normalized_cov, wplane).reshape(-1)[:n_bins]


@functools.partial(jax.jit, static_argnames=("n_bins", "tile", "interpret"))
def grad_hist_fused(recon_cov: jnp.ndarray, relevant_cov: jnp.ndarray,
                    n_bins: int = 1024, tile: int = 16,
                    interpret: bool = False) -> jnp.ndarray:
    """recon + relevance (coverage-padded [cov, cov]) -> gradation histogram.

    The block height equals the 16-row tile so the whole-tile `return`
    semantics stay inside one grid step.
    """
    C, F, _ = _factor(n_bins)
    cov = recon_cov.shape[-1]
    assert recon_cov.shape[-2] % tile == 0
    rblk = next((r for r in (6 * tile, 3 * tile, 2 * tile, tile)
                 if recon_cov.shape[-2] % r == 0), tile)
    return pl.pallas_call(
        functools.partial(_grad_kernel, C=C, F=F, n_bins=n_bins, tile=tile),
        grid=(recon_cov.shape[-2] // rblk,),
        in_specs=[
            pl.BlockSpec((rblk, cov), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rblk, cov), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), I32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * recon_cov.size * C * F,
            bytes_accessed=recon_cov.size * 8, transcendentals=0),
    )(recon_cov, relevant_cov).reshape(-1)[:n_bins]
