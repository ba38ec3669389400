"""A/B the fused pipeline against phase-barriered variants on the real chip.

profile_phases.py measures the fused full program ~0.9 ms SLOWER than the
sum of its individually-fenced phases (4.35 vs 3.47 ms at 3072) -- i.e. XLA's
cross-phase fusion choices (duplicating producers into multiple consumers,
or worse layouts) cost more than the materialization they avoid.  This
script rebuilds the pipeline inside ONE jit with
``lax.optimization_barrier`` at selected phase boundaries to find which
boundary is responsible.
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
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))


def _bar(tree, on: bool):
    return lax.optimization_barrier(tree) if on else tree


def forward(im, barriers: frozenset):
    """musica_forward's body with optional barriers at phase boundaries.

    barriers is a frozenset of phase names from
    {"norm", "reduce", "analysis", "apply", "expand"}; a barrier after a
    phase forces its outputs to be materialized (no fusion into consumers).
    """
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    normalized = _bar(normalized, "norm" in barriers)

    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    if "reduce" in barriers:
        bandpass = list(_bar(tuple(bandpass), True))
        downs = list(_bar(tuple(downs), True))

    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    hists, max_bins = stats.analysis_noise_hists(sdevs, cfg, "auto")
    if "analysis" in barriers:
        sdevs = dict(zip(sdevs.keys(), _bar(tuple(sdevs.values()), True)))

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
    if "apply" in barriers:
        exp_bandpass = list(_bar(tuple(exp_bandpass), True))
        nr_bandpass = dict(zip(nr_bandpass.keys(),
                               _bar(tuple(nr_bandpass.values()), True)))

    recon = downs[L - 1]
    for i in range(L):
        lvl = L - 1 - i
        low = pyramid.upsample_smooth(recon, bandpass[lvl].shape[-1])
        band = (nr_bandpass[lvl] if lvl < cfg.cnr_level - 1
                else exp_bandpass[lvl])
        recon = low + band
    recon = _bar(recon, "expand" in barriers)

    grad_input = recon * recon if cfg.grad_with_linear_image else recon
    ghist = gradation.gradation_histogram_fused_relevance(
        grad_input, normalized, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    return curves.curve_apply_u8_adaptive(
        gpx, gpy, grad_input[..., m:-m, m:-m])


def timed_variant(name, barriers):
    f = jax.jit(lambda a: forward(a, frozenset(barriers))
                .astype(jnp.uint32).sum())
    ms = marginal_ms(f, (img,))
    print(f"{name:24s} {ms:7.3f} ms")
    return ms


def main():
    print("device:", jax.devices()[0])
    ref = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                  .astype(jnp.uint32).sum())
    print(f"{'musica_forward (prod)':24s} {marginal_ms(ref, (img,)):7.3f} ms")
    timed_variant("no barriers", [])
    timed_variant("all barriers",
                  ["norm", "reduce", "analysis", "apply", "expand"])
    timed_variant("reduce only", ["reduce"])
    timed_variant("analysis only", ["analysis"])
    timed_variant("apply only", ["apply"])
    timed_variant("expand only", ["expand"])
    timed_variant("norm only", ["norm"])


if __name__ == "__main__":
    main()
