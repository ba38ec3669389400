"""Degenerate-input robustness + metamorphic properties as direct tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing import metrics, perturb
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph


def test_constant_and_extreme_inputs_do_not_crash():
    """Degenerate inputs must not raise.  (An all-constant image makes
    max == min, so normalize divides by zero exactly as the reference's
    img_normalize would -- values are then unspecified but finite-shaped.)"""
    cfg = MusicaConfig(image_size=512)
    for img in [np.zeros((512, 512), np.uint16),
                np.full((512, 512), 65535, np.uint16),
                np.full((512, 512), 1234, np.uint16)]:
        out = musica.process(img, cfg)
        assert out.shape == (492, 492)
        assert out.dtype == np.uint8


def test_single_hot_pixel():
    cfg = MusicaConfig(image_size=512)
    img = np.full((512, 512), 20000, np.uint16)
    img[256, 256] = 60000
    out = musica.process(img, cfg)
    assert out.shape == (492, 492)


def test_mr_quantum_noise_monotone_degradation():
    """MR: stronger dose reduction -> less similar output (the property the
    slope criterion formalizes).  At small sizes the adaptive noise handling
    can invert the trend (hist-coverage boundary), so this runs at 1024 where
    the 3072-scale behavior holds."""
    img = synthetic_radiograph(1024, "thorax")
    cfg = MusicaConfig(image_size=1024)
    rng = np.random.default_rng(5)
    base = musica.process(img.T, cfg)
    sims = []
    for fac in (0.1, 0.00625):
        noisy = perturb.apply_quantum_noise(img, fac, rng)
        out = musica.process(noisy.T, cfg)
        sims.append(metrics.mse_similarity(out, base))
    assert sims[0] > sims[1], sims
    assert sims[1] < 0.95


def test_mr_translation_content_follows(phantom_512):
    """MR: translating the input translates the output (compare overlap)."""
    cfg = MusicaConfig(image_size=512)
    t = 64
    base = musica.process(phantom_512.T, cfg)
    shifted = perturb.clamp_translation(phantom_512, x_shift=t)
    out = musica.process(shifted.T, cfg)
    m = 10
    # CLI transpose: file-layout x shift appears along output axis 0
    a = out[t:, :]
    b = base[m - 10:out.shape[0] - t + (m - 10), :] if False else base[: out.shape[0] - t, :]
    # coarse check: the shifted overlap is far more similar than misaligned
    sim_aligned = metrics.mse_similarity(a[: b.shape[0] - 10, 100:-100],
                                         base[10: a.shape[0], 100:-100])
    sim_unaligned = metrics.mse_similarity(out[: base.shape[0], 100:-100],
                                           base[:, 100:-100])
    assert sim_aligned > sim_unaligned


def test_intensity_scaling_robustness(phantom_512):
    """MR: the sqrt+normalize front end makes the pipeline approximately
    invariant to a global dose scale."""
    cfg = MusicaConfig(image_size=512)
    base = musica.process(phantom_512.T, cfg)
    scaled = np.clip(phantom_512.astype(np.float64) * 1.5, 0, 65535
                     ).astype(np.uint16)
    out = musica.process(scaled.T, cfg)
    assert metrics.mse_similarity(out, base) > 0.9
