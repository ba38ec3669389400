"""Probe WHY apply/tonemap cost 4-6x more in-context than standalone
(exp_ablate.py: apply 1.42 ms vs 0.33 standalone, tonemap 1.19 vs 0.22).

Hypotheses probed, each as a full-pipeline variant (one process):
  tm_nocond     -- tone map WITHOUT the runtime lax.cond (direct sorted
                   chain): if ~1 ms cheaper, the cond executes BOTH branches
                   (XLA conditional-to-select)
  tm_firstmatch -- tone map always running the first-match chain (faithful
                   for any px): cheaper than cond if both branches run
  ap_flat       -- contrast apply as flat hcf multiply (no chain, same
                   buffers): in-context cost of the chains alone
  ap_barrier    -- barrier between sdev/curve scalars and the chain (forces
                   materialization; tests recompute-into-consumer)
  sd_barrier    -- barrier on sdev L0 only
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: E402
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
F32 = jnp.float32


def forward(im, *, mode=""):
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    if mode == "sd_barrier":
        sdevs[0] = lax.optimization_barrier(sdevs[0])
    _, max_bins = stats.analysis_noise_hists(sdevs, cfg, "auto")
    curve_list = []
    for i in range(L):
        lcf, hcf = cfg.contrast_factors[i]
        mb = max_bins.get(i, jnp.zeros((), jnp.int32))
        curve_list.append(curves.contrast_curve(mb, lcf, hcf, cfg))
    cnr = noise.img_cnr(sdevs[cfg.cnr_level], max_bins[cfg.cnr_level], cfg)
    exp_bandpass = []
    for i in range(L):
        px, py = curve_list[i]
        if mode == "ap_flat":
            eb = bandpass[i] * jnp.float32(cfg.contrast_factors[i][1])
        elif i in sdevs:
            if mode == "ap_barrier":
                px, py = lax.optimization_barrier((px, py))
            eb = curves.contrast_curve_apply(bandpass[i], sdevs[i], px, py)
        else:
            eb = bandpass[i] * jnp.float32(cfg.contrast_factors[i][1])
        exp_bandpass.append(eb)
    nr_bandpass = {}
    for lvl in range(cfg.cnr_level):
        lo_c, lo_f, hi_c, hi_f = cfg.noise_reduction_params[lvl]
        nr_bandpass[lvl] = noise.noise_reduction(
            exp_bandpass[lvl], cnr, lo_c, lo_f, hi_c, hi_f, cfg)
    recon = downs[L - 1]
    for i in range(L):
        lvl = L - 1 - i
        low = pyramid.upsample_smooth(recon, bandpass[lvl].shape[-1])
        band = (nr_bandpass[lvl] if lvl < cfg.cnr_level - 1
                else exp_bandpass[lvl])
        recon = low + band
    ghist = gradation.gradation_histogram_fused_relevance(
        recon, normalized, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    cropped = recon[..., m:-m, m:-m]
    if mode == "tm_nocond":
        g = curves.curve_get_y_sorted(gpx, gpy, cropped)
        out = jnp.clip(jnp.trunc(F32(255.0) * g), 0.0, 255.0).astype(jnp.uint8)
    elif mode == "tm_firstmatch":
        g = curves.curve_get_y(gpx, gpy, cropped)
        out = jnp.clip(jnp.trunc(F32(255.0) * g), 0.0, 255.0).astype(jnp.uint8)
    else:
        out = curves.curve_apply_u8_adaptive(gpx, gpy, cropped)
    return jnp.sum(out.astype(jnp.uint32))


def main():
    print("device:", jax.devices()[0])
    base = None
    for mode in ("", "tm_nocond", "tm_firstmatch", "ap_flat", "ap_barrier",
                 "sd_barrier", "base_re"):
        m = "" if mode == "base_re" else mode
        f = jax.jit(partial(forward, mode=m))
        ms = marginal_ms(f, (img,))
        tag = mode if mode else "baseline"
        if base is None:
            base = ms
            print(f"{tag:14s} {ms:7.3f} ms")
        else:
            print(f"{tag:14s} {ms:7.3f} ms  delta {base - ms:+6.3f}")


if __name__ == "__main__":
    main()
