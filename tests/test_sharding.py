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
    # 128 px: the shard_map/lax.map dp plumbing is size-independent
    # (1-core cold-suite budget; conv/hist quirks are covered at 256+
    # by the spatial tests below)
    cfg = MusicaConfig(image_size=128)
    imgs = np.stack([synthetic_radiograph(128, a)
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


@pytest.mark.parametrize(
    "size",
    [300,
     pytest.param(600, marks=pytest.mark.slow),
     pytest.param(1792, marks=pytest.mark.slow)])
def test_spatial_sharding_ragged_sizes(size):
    """Row-sharded pipeline at non-power-of-two sizes where ceil(n/2)
    pyramid levels go odd (300 -> 150/75/38/19/10/5/3/2; the slow-marked
    600/1792 re-cover the same quirk surface at scale) and shard
    boundaries stop aligning with the 5x5 conv halos -- exactly where GSPMD
    halo-exchange bugs would hide.

    Tolerance note (bisected in detail): all analysis stages (bandpass,
    downsampled, sdev, CNR, max-bins, tone curve) are BIT-equal under the
    row sharding; the expand-ladder reconstruction picks up 1-ulp f32
    differences (rel ~1e-7) at odd level sizes because XLA's fusion/FMA
    codegen differs between the partitioned and unpartitioned programs --
    not a halo defect (a wrong halo row would shift values by whole
    bandpass magnitudes, ~1e-2).  Occasionally one such ulp crosses a
    truncation boundary in the final x255 u8 quantize, so the assertion is
    |delta_u8| <= 1 on < 0.01% of pixels; even/aligned sizes remain
    bit-exact (test_spatial_sharding_matches_single)."""
    cfg = MusicaConfig(image_size=size)
    imgs = np.stack([synthetic_radiograph(size, "thorax"),
                     synthetic_radiograph(size, "pelvis")])
    mesh = sharding.make_mesh(n_data=2, n_space=4)
    out = np.asarray(sharding.process_sharded(jnp.asarray(imgs), cfg, mesh))
    ref = np.asarray(musica.process_batch_jit(jnp.asarray(imgs), cfg, "fact"))
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max u8 delta {diff.max()}"
    frac = (diff > 0).mean()
    assert frac < 1e-4, f"{frac:.2e} of pixels differ (expected < 1e-4)"


def test_spatial_sharding_bf16_storage():
    """storage="bfloat16" under GSPMD row sharding (round-4 gap: the new
    storage mode never ran sharded).  The partitioned program's bf16
    ladders must track the unpartitioned bf16 batch path with the same
    contract the bf16 tests pin vs f32: |delta_u8| <= 1 outside isolated
    knife-edge flips of the getY out-of-curve zero (tests/test_bf16.py)."""
    cfg = MusicaConfig(image_size=256, storage="bfloat16")
    imgs = np.stack([synthetic_radiograph(256, "knee"),
                     synthetic_radiograph(256, "head")])
    mesh = sharding.make_mesh(n_data=2, n_space=4)
    out = np.asarray(sharding.process_sharded(jnp.asarray(imgs), cfg, mesh))
    ref = np.asarray(musica.process_batch_jit(jnp.asarray(imgs), cfg))
    d = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    knife = d > 32
    assert float(knife.mean()) <= 1e-3, knife.mean()
    assert ((d <= 1) | knife).all(), d.max()
    assert (d > 0).mean() < 0.02


def test_throughput_step_runs():
    cfg = MusicaConfig(image_size=128)
    mesh = sharding.make_mesh(n_data=4, n_space=2)
    step, batch = sharding.throughput_step(cfg, mesh, batch_per_device=1)
    s = step(batch)
    assert np.asarray(s).shape == ()


@pytest.mark.parametrize("variant", ["clahe", "linear"])
def test_variant_sharding_576(variant):
    """CLAHE / linear-gradation configs under GSPMD row sharding at 576
    (> hist_coverage 512, so the noise-hist coverage quirk #8 is live on a
    sharded image).  round-3 gap: only the default config ever ran sharded.

    For CLAHE the tile tone-map output itself is requested from the sharded
    program (otherwise XLA dead-code-eliminates the whole CLAHE path)."""
    cfg = MusicaConfig(image_size=576,
                       enable_clahe=(variant == "clahe"),
                       grad_with_linear_image=(variant == "linear"))
    assert cfg.hist_coverage == 512
    imgs = np.stack([synthetic_radiograph(576, "thorax"),
                     synthetic_radiograph(576, "head")])
    # (2, 2): row sharding still exercises conv halos + hist all-reduces +
    # the coverage quirk; the 4-way space split is covered by the ragged
    # tests (suite runs on ONE host core, so GSPMD compile time dominates)
    mesh = sharding.make_mesh(n_data=2, n_space=2)
    outputs = ("out_u8", "clahe_graded") if variant == "clahe" else ("out_u8",)
    out = sharding.process_sharded(jnp.asarray(imgs), cfg, mesh,
                                   outputs=outputs)

    @jax.jit
    def one(im):
        r = musica.musica_forward(im, cfg, "fact")
        return tuple(r[k] for k in outputs)

    ref = [np.stack(x) for x in zip(*(one(im) for im in jnp.asarray(imgs)))]
    # odd pyramid levels (9/5/3) pick up 1-ulp FMA/fusion differences in the
    # partitioned expand ladder (see test_spatial_sharding_ragged_sizes)
    diff = np.abs(np.asarray(out[0] if variant == "clahe" else out)
                  .astype(np.int32) - ref[0].astype(np.int32))
    assert diff.max() <= 1, f"max u8 delta {diff.max()}"
    assert (diff > 0).mean() < 1e-4
    if variant == "clahe":
        np.testing.assert_allclose(np.asarray(out[1]), ref[1],
                                   rtol=0, atol=1e-5)


def test_structural_config_sharding_576():
    """A structurally non-default config under GSPMD row sharding: shifted
    analysis levels (coarser_levels_start=2, cnr_level=2 -> analysis set
    {0,1,2}, NR on 2 levels) and non-factorizable histogram bins (2000) at
    576 (coverage quirk live).  The variant test above only re-wires the
    gradation tail; this changes which per-level programs exist at all --
    the partitioner sees a different graph shape."""
    cfg = MusicaConfig(image_size=576, coarser_levels_start=2, cnr_level=2,
                       noise_histogram_bins=2000)
    assert cfg.analysis_levels == (0, 1, 2)
    imgs = np.stack([synthetic_radiograph(576, "foot"),
                     synthetic_radiograph(576, "pelvis")])
    mesh = sharding.make_mesh(n_data=2, n_space=2)
    out = np.asarray(sharding.process_sharded(jnp.asarray(imgs), cfg, mesh))
    ref = np.asarray(musica.process_batch_jit(jnp.asarray(imgs), cfg, "fact"))
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.max() <= 1, f"max u8 delta {diff.max()}"
    assert (diff > 0).mean() < 1e-4


def test_data_parallel_multi_output():
    """outputs=(...) on the pure-dp (space == 1, check_vma=False) path:
    the tuple plumbing through shard_map/lax.map must shard every output
    over `data` and match per-image single-device results."""
    cfg = MusicaConfig(image_size=256)
    imgs = np.stack([synthetic_radiograph(256, "foot"),
                     synthetic_radiograph(256, "thorax")])
    mesh = sharding.make_mesh(n_data=2, n_space=1)
    out_u8, cnr = sharding.process_sharded(
        jnp.asarray(imgs), cfg, mesh, outputs=("out_u8", "cnr"))
    assert np.asarray(out_u8).shape == (2, 236, 236)
    assert np.asarray(cnr).dtype == np.float32
    for i, im in enumerate(imgs):
        r = musica.musica_forward(jnp.asarray(im), cfg)
        np.testing.assert_array_equal(np.asarray(out_u8)[i],
                                      np.asarray(r["out_u8"]))
        # cnr is a raw f32 intermediate: the sharded program's fusion/FMA
        # differs from the single-image program's by a few ulps in the sdev
        # conv accumulation (measured max rel 5.7e-6; same class as the
        # ragged-size tolerance note above); u8 outputs stay bit-equal
        np.testing.assert_allclose(np.asarray(cnr)[i], np.asarray(r["cnr"]),
                                   rtol=1e-5, atol=0)
