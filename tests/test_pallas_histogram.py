"""Factorized one-hot histogram: XLA and Pallas (interpret-mode) versions
must match the scatter oracle exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import stats
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas import histogram as phist


@pytest.mark.parametrize("n_bins", [2048, 1024, 50])
def test_factorized_xla_matches_scatter(rng, n_bins):
    n = 40000
    b = rng.integers(0, n_bins, n).astype(np.int32)
    w = rng.integers(0, 101, n).astype(np.float32)
    ref = np.asarray(stats.fixed_histogram(jnp.asarray(b), jnp.asarray(w),
                                           n_bins, "scatter"))
    fact = np.asarray(phist.factorized_histogram(jnp.asarray(b), jnp.asarray(w),
                                                 n_bins))
    np.testing.assert_array_equal(fact, ref)


@pytest.mark.parametrize("n", [100, 16384, 50000])
def test_factorized_pallas_interpret_matches_scatter(rng, n):
    n_bins = 2048
    b = rng.integers(0, n_bins, n).astype(np.int32)
    w = (rng.random(n) < 0.8).astype(np.float32)
    ref = np.asarray(stats.fixed_histogram(jnp.asarray(b), jnp.asarray(w),
                                           n_bins, "scatter"))
    pal = np.asarray(phist.factorized_histogram_pallas(
        jnp.asarray(b), jnp.asarray(w), n_bins, block=8192, interpret=True))
    np.testing.assert_array_equal(pal, ref)


def test_bf16_weight_exactness():
    # integer weights up to 100 (gradation) must be exact through bf16
    n_bins = 1024
    b = jnp.asarray(np.full(5000, 7, np.int32))
    w = jnp.asarray(np.full(5000, 100.0, np.float32))
    h = np.asarray(phist.factorized_histogram(b, w, n_bins))
    assert h[7] == 500000.0
    assert h.sum() == 500000.0
