"""Crop-first vs crop-last tone map.

The crop-first tone map runs the getY chain + quantize on a [3052, 3052]
slice at offset 10 — every tile misaligned from the (8, 128) grid.  The
alternative evaluates the chain on the full aligned 3072² and slices the u8
at the end: 1.3% more chain work, but aligned tiles and a cheap 9 MB u8
slice.  Bit-identical by construction (elementwise op commutes with slice).
Pipeline-level A/B on the real chip.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: E402
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
F32 = jnp.float32


def forward(im, *, crop_last=False):
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
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
        if i in sdevs:
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
    if crop_last:
        out = curves.curve_apply_u8_adaptive(gpx, gpy, recon)[..., m:-m, m:-m]
    else:
        out = curves.curve_apply_u8_adaptive(gpx, gpy, recon[..., m:-m, m:-m])
    return jnp.sum(out.astype(jnp.uint32))


def main():
    print("device:", jax.devices()[0])
    base = ref = None
    for tag, cl in (("crop_first", False), ("crop_last", True),
                    ("crop_first_re", False)):
        f = jax.jit(partial(forward, crop_last=cl))
        out = np.asarray(f(img))
        ms = marginal_ms(f, (img,))
        if base is None:
            base, ref = ms, out
            print(f"{tag:14s} {ms:7.3f} ms", flush=True)
        else:
            print(f"{tag:14s} {ms:7.3f} ms  delta {base - ms:+6.3f}  "
                  f"checksum_equal={bool(np.all(out == ref))}", flush=True)


if __name__ == "__main__":
    main()
