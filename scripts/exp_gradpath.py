"""Pipeline-level A/B: in-kernel-relevance grad hist vs XLA relevance +
plain grad kernel, plus standalone getY-chain costs after the scalar-select
rewrite.  One process, marginal-cost methodology."""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: E402
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))


def forward_prerel(im):
    """musica_forward but with the two-step gradation path (XLA relevance +
    plain grad kernel) in place of the fused-relevance kernel."""
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    hists, max_bins = stats.analysis_noise_hists(sdevs, cfg, "auto")
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
    grad_input = recon * recon if cfg.grad_with_linear_image else recon
    relevant = noise.img_relevant(normalized, cnr, cfg)
    ghist = gradation.gradation_histogram(grad_input, relevant, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    return curves.curve_apply_u8_adaptive(
        gpx, gpy, grad_input[..., m:-m, m:-m])


def main():
    print("device:", jax.devices()[0])
    f_prod = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                     .astype(jnp.uint32).sum())
    f_pre = jax.jit(lambda a: forward_prerel(a).astype(jnp.uint32).sum())
    # sanity: identical outputs
    o1 = np.asarray(jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"])(img))
    o2 = np.asarray(jax.jit(forward_prerel)(img))
    print("outputs equal:", np.array_equal(o1, o2))

    p1 = marginal_ms(f_prod, (img,))
    print(f"{'pipeline relfused (prod)':26s} {p1:7.3f} ms")
    p2 = marginal_ms(f_pre, (img,))
    print(f"{'pipeline prerel':26s} {p2:7.3f} ms")
    p1b = marginal_ms(f_prod, (img,))
    print(f"{'pipeline relfused (re)':26s} {p1b:7.3f} ms")

    # standalone getY costs after the scalar-select rewrite
    res = jax.jit(partial(musica.musica_forward, cfg=cfg,
                          want_intermediates=True))(img)
    inter = res["intermediates"]
    band0 = jnp.asarray(np.asarray(inter["red_bandpass_0"]))
    sdev0 = jnp.asarray(np.asarray(inter["sdev_0"]))
    recon = jnp.asarray(np.asarray(res["recon"]))
    mb0 = jnp.asarray(np.asarray(inter["noise_max_bin_0"]))
    lcf, hcf = cfg.contrast_factors[0]
    px, py = jax.jit(partial(curves.contrast_curve, low_contrast_factor=lcf,
                             high_contrast_factor=hcf, cfg=cfg))(mb0)
    px = jnp.asarray(np.asarray(px)); py = jnp.asarray(np.asarray(py))
    print(f"{'contrast_apply0':26s} "
          f"{marginal_ms(jax.jit(curves.contrast_curve_apply), (band0, sdev0, px, py)):7.3f} ms")
    gpx, gpy, _ = inter["grad_curve"]
    gpx = jnp.asarray(np.asarray(gpx)); gpy = jnp.asarray(np.asarray(gpy))
    mm = cfg.out_margin

    def tonemap(r, a, b):
        return curves.curve_apply_u8_adaptive(a, b, r[..., mm:-mm, mm:-mm])
    print(f"{'tonemap':26s} "
          f"{marginal_ms(jax.jit(tonemap), (recon, gpx, gpy)):7.3f} ms")


if __name__ == "__main__":
    main()
