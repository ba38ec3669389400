"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.parallel import sharding
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_data_parallel_matches_single():
    cfg = MusicaConfig(image_size=256)
    imgs = np.stack([synthetic_radiograph(256, a)
                     for a in ("foot", "hand", "head", "knee",
                               "pelvis", "thorax", "foot", "hand")])
    mesh = sharding.make_mesh(n_data=8, n_space=1)
    out = np.asarray(sharding.process_sharded(jnp.asarray(imgs), cfg, mesh))
    ref = np.asarray(musica.process_batch_jit(jnp.asarray(imgs), cfg))
    np.testing.assert_array_equal(out, ref)


def test_spatial_sharding_matches_single():
    """Rows sharded over 4 devices: GSPMD must insert conv halos and
    histogram all-reduces without changing the result."""
    cfg = MusicaConfig(image_size=256)
    imgs = np.stack([synthetic_radiograph(256, "knee"),
                     synthetic_radiograph(256, "head")])
    mesh = sharding.make_mesh(n_data=2, n_space=4)
    out = np.asarray(sharding.process_sharded(jnp.asarray(imgs), cfg, mesh))
    ref = np.asarray(musica.process_batch_jit(jnp.asarray(imgs), cfg))
    np.testing.assert_array_equal(out, ref)


def test_throughput_step_runs():
    cfg = MusicaConfig(image_size=128)
    mesh = sharding.make_mesh(n_data=4, n_space=2)
    step, batch = sharding.throughput_step(cfg, mesh, batch_per_device=1)
    s = step(batch)
    assert np.asarray(s).shape == ()
