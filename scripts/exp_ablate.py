"""Leave-one-out pipeline ablation on the real chip.

Standalone op costs don't add up to the fused program's cost (sum ~3.5 ms vs
fused ~3.9-4.3 ms), so decisions must use IN-CONTEXT costs: each variant
removes one stage from the full program; (full - variant) is that stage's
true marginal contribution inside the fused schedule.
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


def forward(im, *, skip=frozenset()):
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    if "hists" in skip:
        max_bins = {i: jnp.zeros((), jnp.int32) + 37 for i in sdevs}
    else:
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
        if "apply" in skip:
            eb = bandpass[i]
        elif i in sdevs:
            eb = curves.contrast_curve_apply(bandpass[i], sdevs[i], px, py)
        else:
            eb = bandpass[i] * jnp.float32(cfg.contrast_factors[i][1])
        exp_bandpass.append(eb)
    nr_bandpass = {}
    for lvl in range(cfg.cnr_level):
        if "nr" in skip:
            nr_bandpass[lvl] = exp_bandpass[lvl]
        else:
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
    grad_input = recon
    if "gradhist" in skip:
        ghist = (jnp.zeros((cfg.grad_histogram_bins,), jnp.int32)
                 .at[100:900].set(500))
    else:
        ghist = gradation.gradation_histogram_fused_relevance(
            grad_input, normalized, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    if "tonemap" in skip:
        return (jnp.sum(grad_input) + jnp.sum(gpy)).astype(F32)
    out = curves.curve_apply_u8_adaptive(gpx, gpy, grad_input[..., m:-m, m:-m])
    return jnp.sum(out.astype(jnp.uint32)).astype(F32)


def main():
    print("device:", jax.devices()[0])
    base = None
    for name, skip in (("full", ()), ("tonemap", ("tonemap",)),
                       ("gradhist", ("gradhist",)), ("apply", ("apply",)),
                       ("nr", ("nr",)), ("hists", ("hists",)),
                       ("full_re", ())):
        f = jax.jit(partial(forward, skip=frozenset(skip)))
        ms = marginal_ms(f, (img,))
        if name.startswith("full"):
            base = ms
            print(f"{name:10s} {ms:7.3f} ms")
        else:
            print(f"{name:10s} {ms:7.3f} ms  in-context cost {base - ms:6.3f}")


if __name__ == "__main__":
    main()
