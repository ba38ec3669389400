"""Decompose the analysis phase (and grad hist) on the real chip.

Per-component marginal costs at 3072: sdev per level, fused noise hist per
level, argmax, the assembled phase, and stacked-multi-level hist variants --
to find where the 0.95 ms goes and whether batching the small levels pays.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (
    normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas import fused_hist
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph

from profile_phases import marginal_ms  # noqa: E402  (same dir)

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))


@partial(jax.jit, static_argnames=("cfg",))
def p_prep(im, cfg=cfg):
    nrm, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, _ = pyramid.reduce_ladder(nrm, cfg.pyramid_levels)
    return bandpass


@partial(jax.jit, static_argnames=("cfg",))
def p_analysis(bandpass, cfg=cfg):
    sdevs, max_bins = {}, {}
    for i in cfg.analysis_levels:
        sd = stats.img_sdev(bandpass[i])
        sdevs[i] = sd
        _, max_bins[i] = stats.histogram_max(
            stats.noise_histogram(sd, cfg, "auto"))
    return sdevs, max_bins


def sdev_lvl(i):
    return jax.jit(lambda bp: stats.img_sdev(bp[i]))


def hist_lvl(i):
    @jax.jit
    def f(sdevs):
        return stats.noise_histogram(sdevs[i], cfg, "auto")
    return f


@jax.jit
def p_sdev_all(bandpass):
    return {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}


@jax.jit
def p_hists_all(sdevs):
    return [stats.noise_histogram(sdevs[i], cfg, "auto")
            for i in cfg.analysis_levels]


@jax.jit
def p_argmax_all(hists):
    return [stats.histogram_max(h)[1] for h in hists]


@jax.jit
def p_hist_stacked(sdevs):
    """Levels 0-2 coverage views are all 512x512: one [3*512, 512] fused
    call with per-block tile semantics unchanged (the kernel's grid walks
    rows; 512 % rows == 0 keeps blocks within one level when rows <= 512)."""
    views = [stats.coverage_view(sdevs[i], cfg) for i in range(3)]
    stacked = jnp.concatenate(views, axis=0)  # [1536, 512]
    h = fused_hist.noise_hist_multi(
        stacked, n_images=3, n_bins=cfg.noise_histogram_bins,
        tile=cfg.histogram_area_size, max_noise=cfg.max_noise_value,
        rows=128)
    h3 = stats.noise_histogram(sdevs[3], cfg, "auto")
    return h, h3


@partial(jax.jit, static_argnames=("cfg",))
def p_prep_grad(im, cfg=cfg):
    out = musica.musica_forward(im, cfg)
    nrm, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    return out["recon"], nrm, out["cnr"]


@partial(jax.jit, static_argnames=("cfg",))
def p_grad_hist(recon, nrm, cnr, cfg=cfg):
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import gradation
    return gradation.gradation_histogram_fused_relevance(recon, nrm, cnr, cfg, "auto")


def main():
    print("device:", jax.devices()[0])
    bandpass = p_prep(img)
    sdevs, max_bins = p_analysis(bandpass)
    hists = p_hists_all(sdevs)
    recon, nrm, cnr = p_prep_grad(img)

    @partial(jax.jit, static_argnames=("cfg",))
    def p_analysis_multi(bandpass, cfg=cfg):
        sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
        _, max_bins = stats.analysis_noise_hists(sdevs, cfg, "multi")
        return sdevs, max_bins

    @jax.jit
    def p_hist_multi(sdevs):
        return stats.analysis_noise_hists(sdevs, cfg, "multi")

    res = {}
    res["grad_hist"] = marginal_ms(p_grad_hist, (recon, nrm, cnr))
    res["analysis"] = marginal_ms(p_analysis, (bandpass,))
    res["analysis_multi"] = marginal_ms(p_analysis_multi, (bandpass,))
    res["hist_multi"] = marginal_ms(p_hist_multi, (sdevs,))
    # parity of the multi path on real hardware (not just interpret)
    hs, mbs = p_hist_multi(sdevs)
    for i in cfg.analysis_levels:
        ref = np.asarray(stats.noise_histogram(sdevs[i], cfg, "auto"))
        assert np.array_equal(np.asarray(hs[i]), ref), f"hist parity L{i}"
        assert int(mbs[i]) == int(np.argmax(ref)), f"argmax parity L{i}"
    print("multi-vs-fused TPU parity: OK")
    res["sdev_all"] = marginal_ms(p_sdev_all, (bandpass,))
    for i in cfg.analysis_levels:
        res[f"sdev_{i}"] = marginal_ms(sdev_lvl(i), (bandpass,))
    res["hists_all"] = marginal_ms(p_hists_all, (sdevs,))
    for i in cfg.analysis_levels:
        res[f"hist_{i}"] = marginal_ms(hist_lvl(i), (sdevs,))
    res["argmax_all"] = marginal_ms(p_argmax_all, (hists,))
    if hasattr(fused_hist, "noise_hist_multi"):
        res["hist_stacked012"] = marginal_ms(p_hist_stacked, (sdevs,))

    for k, v in res.items():
        print(f"{k:16s} {v:7.3f} ms")


if __name__ == "__main__":
    main()
