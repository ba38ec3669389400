"""Fused pallas histogram kernels (interpret mode) vs the golden model."""

import numpy as np
import pytest

import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import golden
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import gradation, stats


def test_fused_noise_hist_matches_golden(rng):
    cfg = MusicaConfig(image_size=512)
    sd = rng.uniform(0, 0.15, (256, 256)).astype(np.float32)
    sd[rng.uniform(size=(256, 256)) < 0.1] = 0.0
    g = golden.noise_histogram(sd, cfg)
    j = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg,
                                         "fused_interpret"))
    np.testing.assert_array_equal(j.astype(np.int64), g)


def test_fused_noise_hist_matches_fact_small_level(rng):
    cfg = MusicaConfig(image_size=1024)
    sd = rng.uniform(0, 0.12, (128, 128)).astype(np.float32)
    sd[rng.uniform(size=(128, 128)) < 0.05] = 0.0
    a = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg, "fact"))
    b = np.asarray(stats.noise_histogram(jnp.asarray(sd), cfg,
                                         "fused_interpret"))
    np.testing.assert_array_equal(a, b)


def test_fused_grad_hist_matches_golden(rng):
    cfg = MusicaConfig(image_size=256)
    n = 256
    recon = rng.uniform(-0.1, 1.2, (n, n)).astype(np.float32)
    recon[rng.uniform(size=(n, n)) < 0.02] = 0.0
    relevant = (rng.uniform(0, 1, (n, n)) ** 2).astype(np.float32)
    g = golden.gradation_histogram(recon, relevant, cfg)
    j = np.asarray(gradation.gradation_histogram(
        jnp.asarray(recon), jnp.asarray(relevant), cfg, "fused_interpret"))
    np.testing.assert_array_equal(j.astype(np.int64), g)


def test_fused_relevance_grad_hist_matches_two_step(rng):
    cfg = MusicaConfig(image_size=512)
    n = 512
    recon = rng.uniform(-0.1, 1.2, (n, n)).astype(np.float32)
    recon[rng.uniform(size=(n, n)) < 0.02] = 0.0
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
