"""Fused pallas histogram kernels (interpret mode) vs the golden model.

These are EXACT-equality comparisons between differently-compiled programs
(strict NumPy golden, XLA-jitted `fact`, and Pallas interpret mode).  XLA's
fusion-dependent FP contraction (FMA / reassociation) can legally move a
decision value like ``v/0.1*2048 + 0.5`` by 1 ulp between two compilations
of the same formula, flipping the int truncation for pixels that sit within
an ulp of a bin boundary (the GLSL reference is just as unspecified there —
docs/QUIRKS.md #29).  So each test here (a) uses its own deterministic rng
rather than the shared order-dependent session fixture, and (b) perturbs
pixels whose decision values fall within 1e-3 of a boundary — the tests
target kernel *logic* (break semantics, tiling, factorization), not the
contraction behavior of any particular compiler.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import golden
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import gradation, stats

F32 = np.float32


def _snap_noise_bins(sd: np.ndarray, cfg, eps: float = 1e-3) -> np.ndarray:
    """Nudge pixels whose noise-hist decision value ``v/0.1*2048 + 0.5``
    (shaders/noise_hist.comp:31-35) lies within ``eps`` of an integer."""
    sd = sd.copy()
    for _ in range(8):
        t = (sd.astype(F32) / F32(cfg.max_noise_value)) \
            * F32(cfg.noise_histogram_bins) + F32(0.5)
        near = (np.abs(t - np.round(t)) < eps) & (sd > 0)
        if not near.any():
            return sd
        sd[near] *= F32(1.0007)
    raise AssertionError("could not move pixels off bin boundaries")


def _snap_grad_bins(recon: np.ndarray, cfg, eps: float = 1e-3) -> np.ndarray:
    """Nudge pixels whose gradation-hist decision value ``v * 1024``
    (shaders/gradation_histogram.comp:27) lies within ``eps`` of an
    integer truncation boundary."""
    recon = recon.copy()
    for _ in range(8):
        t = recon.astype(F32) * F32(cfg.grad_histogram_bins)
        near = (np.abs(t - np.round(t)) < eps) & (recon != 0)
        if not near.any():
            return recon
        recon[near] += F32(eps / cfg.grad_histogram_bins * 4)
    raise AssertionError("could not move pixels off bin boundaries")


def _snap_weights(relevant: np.ndarray, eps: float = 1e-3) -> np.ndarray:
    """Nudge relevance weights whose ``uint(rel * 100)``
    (shaders/gradation_histogram.comp:30) sits within ``eps`` of a step."""
    relevant = relevant.copy()
    t = relevant.astype(F32) * F32(100.0)
    near = np.abs(t - np.round(t)) < eps
    relevant[near] += F32(0.003)
    return relevant


def test_fused_noise_hist_matches_golden():
    rng = np.random.default_rng(71)
    cfg = MusicaConfig(image_size=512)
    sd = rng.uniform(0, 0.15, (256, 256)).astype(np.float32)
    sd[rng.uniform(size=(256, 256)) < 0.1] = 0.0
    sd = _snap_noise_bins(sd, cfg)
    g = golden.noise_histogram(sd, cfg)
    j = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg,
                                         "fused_interpret"))
    np.testing.assert_array_equal(j.astype(np.int64), g)


def test_fused_noise_hist_matches_fact_small_level():
    rng = np.random.default_rng(72)
    cfg = MusicaConfig(image_size=1024)
    sd = rng.uniform(0, 0.12, (128, 128)).astype(np.float32)
    sd[rng.uniform(size=(128, 128)) < 0.05] = 0.0
    sd = _snap_noise_bins(sd, cfg)
    a = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg, "fact"))
    b = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg,
                                         "fused_interpret"))
    np.testing.assert_array_equal(a, b)


def test_sdev_noise_hist_fused_interpret():
    """Combined sdev+noise-hist kernel (interpret mode): the in-kernel sdev
    tracks the f64 golden oracle to 2e-6 (1-ulp f32 agreement across
    compilers is not defined -- quirk #29 / test_sdev_matches_golden uses
    the same bound), and the histogram is EXACTLY what the plain noise
    kernel produces on the combined kernel's own sdev output -- isolating
    the binning/break logic from sdev's last-ulp wiggle.  Bit-exactness of
    both outputs against the XLA two-step path holds on real TPU hardware
    (scripts/exp_sdev_fused.py) where one Mosaic backend compiles both."""
    rng = np.random.default_rng(75)
    cfg = MusicaConfig(image_size=512)
    band = rng.normal(0, 0.02, (512, 512)).astype(np.float32)
    band[rng.uniform(size=(512, 512)) < 0.01] = 0.0
    sd, h = stats.sdev_and_noise_histogram(jnp.asarray(band), cfg,
                                           "fused_sdev_interpret")
    np.testing.assert_allclose(np.asarray(sd), golden.img_sdev(band),
                               rtol=0, atol=2e-6)
    h2 = np.asarray(stats.noise_histogram(sd, cfg, "fused_interpret"))
    np.testing.assert_array_equal(np.asarray(h), h2)
    assert np.asarray(h).sum() > 0


def test_sdev_noise_hist_fallback_partial_coverage():
    """When the dispatch coverage is not the full level (n % 16 != 0 pads,
    or hist_coverage crops), sdev_and_noise_histogram must fall back to the
    two-step path and match it exactly."""
    rng = np.random.default_rng(76)
    cfg = MusicaConfig(image_size=512)
    band = rng.normal(0, 0.02, (40, 40)).astype(np.float32)  # n_pad = 48 != 40
    sd, h = stats.sdev_and_noise_histogram(jnp.asarray(band), cfg,
                                           "fused_sdev_interpret")
    sd_ref = stats.img_sdev(jnp.asarray(band))
    np.testing.assert_array_equal(np.asarray(sd), np.asarray(sd_ref))
    np.testing.assert_array_equal(
        np.asarray(h),
        np.asarray(stats.noise_histogram(sd_ref, cfg, "fused_interpret")))


def test_fused_grad_hist_matches_golden():
    rng = np.random.default_rng(73)
    cfg = MusicaConfig(image_size=256)
    n = 256
    recon = rng.uniform(-0.1, 1.2, (n, n)).astype(np.float32)
    recon[rng.uniform(size=(n, n)) < 0.02] = 0.0
    recon = _snap_grad_bins(recon, cfg)
    relevant = _snap_weights((rng.uniform(0, 1, (n, n)) ** 2).astype(np.float32))
    g = golden.gradation_histogram(recon, relevant, cfg)
    j = np.asarray(gradation.gradation_histogram(
        jnp.asarray(recon), jnp.asarray(relevant), cfg, "fused_interpret"))
    np.testing.assert_array_equal(j.astype(np.int64), g)


def test_fused_relevance_grad_hist_matches_two_step():
    rng = np.random.default_rng(74)
    cfg = MusicaConfig(image_size=512)
    n = 512
    recon = rng.uniform(-0.1, 1.2, (n, n)).astype(np.float32)
    recon[rng.uniform(size=(n, n)) < 0.02] = 0.0
    recon = _snap_grad_bins(recon, cfg)
    normalized = rng.uniform(0, 1.01, (n, n)).astype(np.float32)
    cnr = rng.uniform(0, 0.1, (64, 64)).astype(np.float32)
    a = np.asarray(gradation.gradation_histogram_fused_relevance(
        jnp.asarray(recon), jnp.asarray(normalized), jnp.asarray(cnr), cfg,
        "fused_interpret"))
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import noise
    rel = noise.img_relevant(jnp.asarray(normalized), jnp.asarray(cnr), cfg)
    b = np.asarray(gradation.gradation_histogram(jnp.asarray(recon), rel, cfg,
                                                 "fact"))
    np.testing.assert_array_equal(a, b)


def test_multi_level_hist_argmax_matches_per_level():
    """The monolithic all-levels kernel (stacked zero-padded coverage views,
    in-kernel argmax) must reproduce the per-level fused path bit-exactly:
    identical counts for every level and identical FIRST-max argmaxes --
    including a ragged set of view sizes (1024-image levels pad 256/128 up
    to the 512 common cov) and an all-zero level (hist all zero -> bin 0)."""
    rng = np.random.default_rng(77)
    cfg = MusicaConfig(image_size=1024)  # analysis levels 0..3: 1024/512/256/128
    sdevs = {}
    for j, i in enumerate(cfg.analysis_levels):
        n = 1024 >> i
        sd = rng.uniform(0, 0.12, (n, n)).astype(np.float32)
        sd[rng.uniform(size=(n, n)) < 0.08] = 0.0
        if i == 3:
            sd[:] = 0.0  # empty level: argmax must be bin 0
        sdevs[i] = jnp.asarray(_snap_noise_bins(sd, cfg))
    hists, maxb = stats.analysis_noise_hists(sdevs, cfg, "multi_interpret")
    for i in cfg.analysis_levels:
        ref = np.asarray(stats.noise_histogram(sdevs[i], cfg, "fact"))
        np.testing.assert_array_equal(np.asarray(hists[i]), ref, err_msg=f"level {i}")
        assert int(maxb[i]) == int(np.argmax(ref)), f"level {i} argmax"
    assert int(maxb[3]) == 0


def test_multi_level_argmax_first_max_tie():
    """Duplicate maximum counts: the in-kernel argmax must keep the FIRST
    bin (img_histogram_max.comp uses strict >), same as jnp.argmax."""
    cfg = MusicaConfig(image_size=256)
    # two discrete sdev values mapping to two different bins, equal counts
    v1, v2 = np.float32(0.0301), np.float32(0.0703)
    sd0 = np.zeros((256, 256), np.float32)
    sd0[0, :16] = v1   # one full tile-column group each, no breaks
    sd0[0, 16:32] = v2
    sdevs = {i: jnp.asarray(np.zeros((256 >> i, 256 >> i), np.float32))
             for i in cfg.analysis_levels}
    sdevs[0] = jnp.asarray(sd0)
    hists, maxb = stats.analysis_noise_hists(sdevs, cfg, "multi_interpret")
    h0 = np.asarray(hists[0])
    top = np.flatnonzero(h0 == h0.max())
    assert len(top) >= 2  # a genuine tie
    assert int(maxb[0]) == int(np.argmax(h0))


def test_pipeline_multi_hist_matches_fact():
    """musica_forward with the monolithic analysis path produces the exact
    output of the per-level fact path (end-to-end wiring check)."""
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
    rng = np.random.default_rng(78)
    img = (rng.uniform(0, 40000, (128, 128))).astype(np.uint16)
    cfg = MusicaConfig(image_size=128)
    a = np.asarray(musica.musica_forward(jnp.asarray(img), cfg,
                                         "multi_interpret")["out_u8"])
    b = np.asarray(musica.musica_forward(jnp.asarray(img), cfg,
                                         "fact")["out_u8"])
    np.testing.assert_array_equal(a, b)


def test_multi_dispatch_nonfactorizable_bins_falls_back():
    """A noise_histogram_bins value _factor can't split exactly (any
    non-multiple of 32, e.g. 2000 -> padded 2048 != 2000) must NOT reach
    noise_hist_argmax_multi (whose flat-index argmax asserts an exact
    factorization at trace time); analysis_noise_hists falls back to the
    per-level fused path, which handles padded factorizations."""
    rng = np.random.default_rng(5)
    cfg = MusicaConfig(image_size=256, noise_histogram_bins=2000)
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.histogram import _factor
    assert _factor(cfg.noise_histogram_bins)[2] != cfg.noise_histogram_bins
    sdevs = {}
    for i in cfg.analysis_levels:
        n = 256 >> i
        sd = rng.uniform(0, 0.12, (n, n)).astype(np.float32)
        sdevs[i] = jnp.asarray(_snap_noise_bins(sd, cfg))
    hists, maxb = stats.analysis_noise_hists(sdevs, cfg, "multi_interpret")
    for i in cfg.analysis_levels:
        ref = np.asarray(stats.noise_histogram(sdevs[i], cfg, "fact"))
        np.testing.assert_array_equal(np.asarray(hists[i]), ref,
                                      err_msg=f"level {i}")
        assert int(maxb[i]) == int(np.argmax(ref)), f"level {i} argmax"
