"""bf16 storage mode (config.py ``storage="bfloat16"``): the TPU-native fast
mode stores the large stage images (normalized input, pyramid bandpasses/
lowpasses, reconstruction) as bf16 while the analysis path (sdev, histograms,
CNR, curve synthesis, getY chains) stays f32.

The mode has no reference analogue; the contract tested here is its
*distance to the f32 parity mode*, measured at 256 on CPU (scripts/
exp_bf16.py validates the same profile at 3072 on chip):

* the overwhelming majority of output pixels are bit-identical;
* every remaining pixel is within 1 u8 LSB, EXCEPT isolated out-of-curve
  knife-edge pixels: the reference's getY returns 0 for x beyond the last
  curve point (the quirk class of docs/QUIRKS.md #29), and a pixel whose
  f32 value sits within one bf16 ulp of that edge can land on the other
  side, flipping 0 <-> ~255.  Those are bounded to a tiny fraction.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import (
    MusicaConfig,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import (
    musica,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import (
    synthetic_radiograph,
)

SIZE = 256


def _outputs(cfg, img):
    return np.asarray(musica.process_jit(img, cfg)).astype(np.int32)


@pytest.fixture(scope="module")
def img():
    return jnp.asarray(synthetic_radiograph(SIZE, "thorax"))


def test_bf16_tracks_f32_parity_mode(img):
    cfg = MusicaConfig(image_size=SIZE)
    o32 = _outputs(cfg, img)
    o16 = _outputs(cfg.with_(storage="bfloat16"), img)
    d = np.abs(o32 - o16)
    frac_diff = float((d > 0).mean())
    frac_big = float((d > 1).mean())
    assert frac_diff <= 0.02, frac_diff          # measured 0.0022 at 256
    assert frac_big <= 1e-3, frac_big            # measured 9e-5 (knife edges)
    # knife-edge pixels are full-scale flips of the getY out-of-curve zero;
    # everything that is not one must be a <=1 LSB rounding difference
    knife = d > 32
    assert ((d <= 1) | knife).all()
    inlier = d[~knife].astype(np.float64)
    mse = (inlier ** 2).mean()
    psnr = np.inf if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 60.0, psnr                    # measured ~75 dB


def test_bf16_batch_matches_single(img):
    """The interleaved batch path must run the same bf16 program."""
    cfg = MusicaConfig(image_size=SIZE, storage="bfloat16")
    single = np.asarray(musica.process_jit(img, cfg))
    batch = np.asarray(musica.process_batch_jit(
        jnp.stack([img] * 4), cfg, interleave=2))
    assert (batch == single[None]).all()


def test_bf16_timed_process_matches_untimed(img):
    """storage is part of the variant space: the timed phases must execute
    the bf16 program, not silently fall back to f32 (the round-3 --timing/
    variant mismatch class)."""
    cfg = MusicaConfig(image_size=SIZE, storage="bfloat16")
    untimed = np.asarray(musica.process_jit(img, cfg)).astype(np.int32)
    timed, times = musica.timed_process(np.asarray(img), cfg)
    d = np.abs(timed.astype(np.int32) - untimed)
    # jit-partition boundaries move a handful of bf16 roundings (the same
    # class the linear-variant timed test tolerates); knife-edge flips of
    # the out-of-curve zero may also switch side at partition boundaries
    knife = d > 32
    assert float(knife.mean()) <= 1e-3
    assert ((d <= 1) | knife).all()
    assert set(times) == {"norm", "red", "anly", "aply", "exp", "grad", "tot"}


def test_storage_validation():
    with pytest.raises(AssertionError):
        MusicaConfig(image_size=SIZE, storage="float16")
