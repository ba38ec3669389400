"""Marginal cost of each hot op at 3072 on the real chip, to rank targets.

Complements profile_phases.py (phase granularity) with op granularity:
sdev, each hist kernel with/without in-kernel relevance, the getY chains,
NR, and the expand top step.
"""

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


def main():
    print("device:", jax.devices()[0])
    res = jax.jit(partial(musica.musica_forward, cfg=cfg,
                          want_intermediates=True))(img)
    inter = res["intermediates"]
    band0 = jnp.asarray(np.asarray(inter["red_bandpass_0"]))
    sdev0 = jnp.asarray(np.asarray(inter["sdev_0"]))
    recon = jnp.asarray(np.asarray(res["recon"]))
    cnr = jnp.asarray(np.asarray(res["cnr"]))
    nrm = jnp.asarray(np.asarray(inter["normalized"]))
    rel = jnp.asarray(np.asarray(inter["relevant"]))
    mb0 = jnp.asarray(np.asarray(inter["noise_max_bin_0"]))

    lcf, hcf = cfg.contrast_factors[0]
    px, py = jax.jit(partial(curves.contrast_curve, low_contrast_factor=lcf,
                             high_contrast_factor=hcf, cfg=cfg))(mb0)
    px = jnp.asarray(np.asarray(px)); py = jnp.asarray(np.asarray(py))

    t = {}
    t["sdev0"] = marginal_ms(jax.jit(stats.img_sdev), (band0,))
    t["noise_hist0"] = marginal_ms(
        jax.jit(partial(stats.noise_histogram, cfg=cfg, method="fused")),
        (sdev0,))
    t["grad_hist_relfused"] = marginal_ms(
        jax.jit(partial(gradation.gradation_histogram_fused_relevance,
                        cfg=cfg, method="fused")), (recon, nrm, cnr))
    t["grad_hist_prerel"] = marginal_ms(
        jax.jit(partial(gradation.gradation_histogram, cfg=cfg,
                        method="fused")), (recon, rel))
    t["img_relevant"] = marginal_ms(
        jax.jit(partial(noise.img_relevant, cfg=cfg)), (nrm, cnr))
    t["contrast_apply0"] = marginal_ms(
        jax.jit(curves.contrast_curve_apply), (band0, sdev0, px, py))
    lo_c, lo_f, hi_c, hi_f = cfg.noise_reduction_params[0]
    t["noise_reduction0"] = marginal_ms(
        jax.jit(partial(noise.noise_reduction, low_cnr=lo_c, low_factor=lo_f,
                        high_cnr=hi_c, high_factor=hi_f, cfg=cfg)),
        (band0, cnr))
    t["upsample_top"] = marginal_ms(
        jax.jit(partial(pyramid.upsample_smooth, out_size=SIZE)),
        (jnp.asarray(np.asarray(inter["downsampled_0"])),))
    for k, v in t.items():
        print(f"{k:22s} {v:7.3f} ms")


if __name__ == "__main__":
    main()
