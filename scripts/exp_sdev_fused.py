"""Experiment: fuse img_sdev (5x5 RMS, zero-pad borders) INTO the noise
histogram kernel so the sdev image is never materialized for the histogram.

Halo strategy: the kernel's main input is (R, n) row blocks; the 2-row
top/bottom halos arrive as separate pre-sliced strip arrays built with
pad+reshape+slice on the host side (XLA fuses these into small (grid, 2, n)
gathers, no full-image copy).  Column taps use masked lane rolls.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.fused_hist import (
    _prefix_or_in_group, noise_hist_fused)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.histogram import _factor
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import stats

I32, F32 = jnp.int32, jnp.float32


def _sdev_noise_kernel(band_ref, top_ref, bot_ref, out_ref, *,
                       C, F, n_bins, tile, max_noise, n):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    band = band_ref[:]          # [R, n]
    # halo blocks are padded to 8 sublanes; only the first 2 rows are real
    ext = jnp.concatenate([top_ref[0:2], band, bot_ref[0:2]], axis=0)  # [R+4, n]
    sq = ext * ext
    R = band.shape[0]
    # 5-tap column sum (over rows, unit stride on sublanes)
    tmp = (sq[0:R, :] + sq[1:R + 1, :] + sq[2:R + 2, :]
           + sq[3:R + 3, :] + sq[4:R + 4, :])
    # 5-tap row sum (over lanes) with zero boundary via masked rolls, in the
    # SAME left-to-right tap order as ops/stats.py::img_sdev (m = 0..4 reads
    # tmp[j + m - 2]) so the f32 accumulation is bit-identical
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

    adjusted = sdev / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((sdev == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = _prefix_or_in_group(brk, tile)
    w = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)

    iota_c = jax.lax.broadcasted_iota(I32, (C, 1), 0)
    iota_f = jax.lax.broadcasted_iota(I32, (F, 1), 0)
    acc = jnp.zeros(out_ref.shape, I32)
    for r in range(R):
        b_row = bins[r:r + 1, :]
        w_row = w[r:r + 1, :]
        cb = b_row // F
        fb = b_row % F
        a_t = jnp.where(cb == iota_c, w_row, 0.0).astype(jnp.bfloat16)
        f_t = (fb == iota_f).astype(jnp.bfloat16)
        part = jax.lax.dot_general(a_t, f_t, (((1,), (1,)), ((), ())),
                                   preferred_element_type=F32)
        acc = acc + part.astype(I32)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("n_bins", "tile", "max_noise",
                                             "rows"))
def noise_hist_sdev_fused(band, n_bins=2048, tile=16, max_noise=0.1, rows=96):
    """bandpass level image [n, n] (n == coverage) -> noise histogram with
    sdev computed in-kernel."""
    n = band.shape[-1]
    assert band.shape[-2] % rows == 0
    grid = band.shape[-2] // rows
    C, F, _ = _factor(n_bins)
    z2 = jnp.zeros((2, n), band.dtype)
    # top halo strips: rows (i*R - 2, i*R - 1), zeros for i == 0; padded to 8
    # sublanes per grid block for the Mosaic block-shape rule
    top = jnp.concatenate([z2, band[:-2]], axis=0).reshape(grid, rows, n)[:, :8]
    # bottom halo strips: rows ((i+1)*R, (i+1)*R + 1), zeros for the last
    bot = jnp.concatenate([band[rows:], jnp.zeros((rows, n), band.dtype)],
                          axis=0).reshape(grid, rows, n)[:, :8]
    top = top.reshape(grid * 8, n)
    bot = bot.reshape(grid * 8, n)
    h = pl.pallas_call(
        functools.partial(_sdev_noise_kernel, C=C, F=F, n_bins=n_bins,
                          tile=tile, max_noise=max_noise, n=n),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((rows, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), I32),
        cost_estimate=pl.CostEstimate(
            flops=2 * band.size * C * F, bytes_accessed=band.size * 4,
            transcendentals=band.size),
    )(band, top, bot)
    return h.reshape(-1)[:n_bins]


def marginal_ms(fn, args, k=24, reps=5):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(g(*args))

    def run(nn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(nn):
                out = g(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 3072
    band = jnp.asarray(rng.normal(0, 0.02, (n, n)).astype(np.float32))
    cfg = MusicaConfig(image_size=n)

    # reference: two-step sdev -> fused hist
    def two_step(b):
        sd = stats.img_sdev(b)
        return stats.noise_histogram(sd, cfg, "fused")

    ref = np.asarray(jax.jit(two_step)(band))
    got = np.asarray(noise_hist_sdev_fused(band))
    ok = "OK " if np.array_equal(got, ref) else "MISMATCH"
    print("exactness:", ok)
    if ok != "OK ":
        d = np.nonzero(got != ref)[0][:5]
        print("first diffs at bins", d, got[d], ref[d])
    t_two = marginal_ms(two_step, (band,))
    t_fused = marginal_ms(noise_hist_sdev_fused, (band,))
    print(f"two-step sdev+hist: {t_two:7.3f} ms   sdev-fused: {t_fused:7.3f} ms")


if __name__ == "__main__":
    main()
