"""One-hot accumulation strategy shootout for the fused noise-hist kernel.

The factorized one-hot build (compare + select per coarse/fine row) plus the
f32 MXU dots dominate the hist kernels (~0.38 ms at cov 2048).  Candidates:

  f32    -- production: f32 one-hot dots, grouped exact tree-sum (baseline)
  int8   -- int8 one-hots (weights <= 100 fit), int8 MXU dot with int32
            accumulation: v5e int8 MXU peak is 2x bf16, and int32 partial
            sums are exact with NO grouping constraint
  bf16   -- one-hots built directly in bf16 (no post-build cast; 0/1 and
            integer weights <= 100 are exact in bf16), single-pass bf16 MXU
            dot with f32 accumulation
  rank3  -- f32 one-hots for ALL rows of the block built as one [R, C, W]
            tensor, one batched dot (fewer, larger Mosaic ops)

All variants must produce bit-identical int32 counts (the GLSL histogram is
a uint32 atomic).  Parity is asserted against the production kernel on the
real chip before timing.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import normalize, pyramid, stats  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas import fused_hist  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.histogram import _factor  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16
I8 = jnp.int8

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)


def _tree_sum(parts):
    while len(parts) > 1:
        nxt = [parts[i] + parts[i + 1] for i in range(0, len(parts) - 1, 2)]
        if len(parts) % 2:
            nxt.append(parts[-1])
        parts = nxt
    return parts[0]


def _accumulate_variant(bins, w, out_ref, C, F, variant):
    rows, width = bins.shape
    if variant == "rank3":
        iota_c = jax.lax.broadcasted_iota(I32, (rows, C, 1), 1)
        iota_f = jax.lax.broadcasted_iota(I32, (rows, F, 1), 1)
        cb = (bins // F).reshape(rows, 1, width)
        fb = (bins % F).reshape(rows, 1, width)
        wr = w.reshape(rows, 1, width)
        a_t = jnp.where(cb == iota_c, wr, 0.0)
        f_t = (fb == iota_f).astype(F32)
        # batched over rows, contract over width -> [rows, C, F]
        parts = jax.lax.dot_general(
            a_t, f_t, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=F32)
        grp = max(1, (1 << 24) // (width * 100 + 1))
        acc = jnp.zeros(out_ref.shape, I32)
        for s in range(0, rows, grp):
            chunk = [parts[r] for r in range(s, min(s + grp, rows))]
            acc = acc + _tree_sum(chunk).astype(I32)
        out_ref[:] += acc
        return

    iota_c = jax.lax.broadcasted_iota(I32, (C, 1), 0)
    iota_f = jax.lax.broadcasted_iota(I32, (F, 1), 0)
    grp = max(1, (1 << 24) // (width * 100 + 1))
    acc = jnp.zeros(out_ref.shape, I32)
    parts = []
    for r in range(rows):
        b_row = bins[r:r + 1, :]
        cb = b_row // F
        fb = b_row % F
        if variant == "int8":
            a_t = jnp.where(cb == iota_c, w[r:r + 1, :].astype(I8),
                            jnp.zeros((), I8))
            f_t = (fb == iota_f).astype(I8)
            parts.append(jax.lax.dot_general(
                a_t, f_t, (((1,), (1,)), ((), ())),
                preferred_element_type=I32))
        elif variant == "bf16":
            a_t = jnp.where(cb == iota_c, w[r:r + 1, :].astype(BF16),
                            jnp.zeros((), BF16))
            f_t = (fb == iota_f).astype(BF16)
            parts.append(jax.lax.dot_general(
                a_t, f_t, (((1,), (1,)), ((), ())),
                preferred_element_type=F32))
        else:  # f32 production formulation
            a_t = jnp.where(cb == iota_c, w[r:r + 1, :], 0.0)
            f_t = (fb == iota_f).astype(F32)
            parts.append(jax.lax.dot_general(
                a_t, f_t, (((1,), (1,)), ((), ())),
                preferred_element_type=F32))
        if variant == "int8":
            if len(parts) == 8 or r == rows - 1:
                acc = acc + _tree_sum(parts)
                parts = []
        elif len(parts) == grp or r == rows - 1:
            acc = acc + _tree_sum(parts).astype(I32)
            parts = []
    out_ref[:] += acc


def _noise_kernel_v(sdev_ref, out_ref, *, C, F, n_bins, tile, max_noise,
                    variant):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = sdev_ref[:]
    adjusted = v / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((v == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = fused_hist._prefix_or_in_group(brk, tile)
    wf = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_variant(bins, wf, out_ref, C, F, variant)


@functools.partial(jax.jit, static_argnames=("n_bins", "tile", "max_noise",
                                             "rows", "variant"))
def noise_hist_v(sdev_cov, n_bins=2048, tile=16, max_noise=0.1, rows=96,
                 variant="f32"):
    C, F, _ = _factor(n_bins)
    cov = sdev_cov.shape[-1]
    r = min(rows, sdev_cov.shape[-2])
    assert sdev_cov.shape[-2] % r == 0
    return pl.pallas_call(
        functools.partial(_noise_kernel_v, C=C, F=F, n_bins=n_bins,
                          tile=tile, max_noise=max_noise, variant=variant),
        grid=(sdev_cov.shape[-2] // r,),
        in_specs=[pl.BlockSpec((r, cov), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C, F), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, F), I32),
    )(sdev_cov).reshape(-1)[:n_bins]


def main():
    print("device:", jax.devices()[0])
    img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def prep(im, cfg=cfg):
        nrm, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
        bandpass, _ = pyramid.reduce_ladder(nrm, cfg.pyramid_levels)
        sd = stats.img_sdev(bandpass[0])
        return stats.coverage_view(sd, cfg)

    v = np.asarray(prep(img))
    v = jnp.asarray(v)
    print("coverage view:", v.shape)

    ref = np.asarray(fused_hist.noise_hist_fused(
        v, cfg.noise_histogram_bins, cfg.histogram_area_size,
        cfg.max_noise_value, rows=96))

    for variant in ("f32", "bf16", "int8", "rank3"):
        try:
            h = np.asarray(noise_hist_v(v, cfg.noise_histogram_bins,
                                        cfg.histogram_area_size,
                                        cfg.max_noise_value, 96,
                                        variant))
            ok = np.array_equal(h, ref)
            ms = marginal_ms(
                functools.partial(noise_hist_v, n_bins=cfg.noise_histogram_bins,
                                  tile=cfg.histogram_area_size,
                                  max_noise=cfg.max_noise_value, rows=96,
                                  variant=variant), (v,))
            print(f"{variant:8s} bit-exact={ok}  {ms:7.3f} ms")
        except Exception as e:
            print(f"{variant:8s} FAILED: {type(e).__name__}: {str(e)[:300]}")

    # row-block sweep for the best variants
    for variant in ("f32", "int8", "bf16"):
        for rows in (48, 96, 192):
            if v.shape[-2] % rows:
                continue
            try:
                ms = marginal_ms(
                    functools.partial(noise_hist_v,
                                      n_bins=cfg.noise_histogram_bins,
                                      tile=cfg.histogram_area_size,
                                      max_noise=cfg.max_noise_value,
                                      rows=rows, variant=variant), (v,))
                print(f"{variant:8s} rows={rows:4d}  {ms:7.3f} ms")
            except Exception as e:
                print(f"{variant:8s} rows={rows:4d} FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()
