"""CLAHE variant tests: against a direct NumPy transcription of the GLSL."""

import numpy as np
import pytest

import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import clahe


def np_clahe_histograms(recon, relevant, cfg):
    t, bins = cfg.clahe_tiles, cfg.clahe_bins
    n = recon.shape[0]
    h = np.zeros((t, t, bins), np.int64)
    for x in range(n):
        tx = int(x / n * t)
        for y in range(n):
            ty = int(y / n * t)
            if relevant[x, y] == 1.0:
                b = int(np.float32(recon[x, y]) * (bins - 1) + 0.5)
                if 0 <= b < bins:
                    h[tx, ty, b] += 1
    return h


def np_clahe_curves(h, cfg):
    bins = cfg.clahe_bins
    counts = h.astype(np.float64)
    total = counts.sum(-1, keepdims=True)
    norm = counts / total
    clip = cfg.clahe_clip_limit
    clipped = np.minimum(norm, clip)
    excess = (norm - clipped).sum(-1, keepdims=True)
    cdf = np.cumsum(clipped + excess / bins, axis=-1)
    px = np.arange(bins) / bins
    px[-1] = 1.0
    return px, cdf


def np_lut_eval(px, py, x):
    """First-match getY over a single 256-point LUT."""
    for i in range(len(px)):
        if px[i] == x:
            return py[i]
        if i + 1 < len(px) and px[i] <= x <= px[i + 1]:
            m = (py[i + 1] - py[i]) / (px[i + 1] - px[i])
            return m * (x - px[i]) + py[i]
    return 0.0


def test_clahe_histograms_match_numpy(rng):
    cfg = MusicaConfig(image_size=128, enable_clahe=True)
    recon = rng.uniform(-0.1, 1.1, (128, 128)).astype(np.float32)
    relevant = (rng.uniform(size=(128, 128)) < 0.5).astype(np.float32)
    g = np_clahe_histograms(recon, relevant, cfg)
    j = np.asarray(clahe.clahe_histograms(jnp.asarray(recon),
                                          jnp.asarray(relevant), cfg))
    np.testing.assert_array_equal(j.astype(np.int64), g)


def test_clahe_curves_match_numpy(rng):
    cfg = MusicaConfig(image_size=128, enable_clahe=True)
    h = rng.integers(0, 500, (4, 4, 256)).astype(np.int64)
    gpx, gpy = np_clahe_curves(h, cfg)
    jpx, jpy = clahe.clahe_curves(jnp.asarray(h, jnp.int32).astype(jnp.float32), cfg)
    np.testing.assert_allclose(np.asarray(jpx), gpx, atol=1e-7)
    np.testing.assert_allclose(np.asarray(jpy), gpy, rtol=0, atol=1e-4)
    # CDF ends at ~1
    assert np.allclose(np.asarray(jpy)[..., -1], 1.0, atol=1e-3)


def test_clahe_lut_eval_matches_linear_search(rng):
    cfg = MusicaConfig(image_size=128, enable_clahe=True)
    h = rng.integers(0, 500, (4, 4, 256)).astype(np.int64)
    px, py = np_clahe_curves(h, cfg)
    xs = np.concatenate([rng.uniform(0, 1, 200),
                         [0.0, 1.0, 0.5, 255 / 256, -0.2, 1.3]]).astype(np.float32)
    ref = np.array([np_lut_eval(px.astype(np.float32),
                                py[2, 1].astype(np.float32), float(x)) for x in xs])
    got = np.asarray(clahe._lut_eval(
        jnp.asarray(px, jnp.float32),
        jnp.asarray(py, jnp.float32).reshape(-1),
        jnp.full(xs.shape, 2 * 4 + 1, jnp.int32),
        jnp.asarray(xs), cfg.clahe_bins))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)


def test_clahe_apply_center_pixel_identity(rng):
    """At a tile center the blend must equal the single-tile LUT value."""
    cfg = MusicaConfig(image_size=128, enable_clahe=True)
    recon = rng.uniform(0, 1, (128, 128)).astype(np.float32)
    relevant = np.ones((128, 128), np.float32)
    h = clahe.clahe_histograms(jnp.asarray(recon), jnp.asarray(relevant), cfg)
    px, py = clahe.clahe_curves(h, cfg)
    out = np.asarray(clahe.clahe_apply(jnp.asarray(recon), px, py, cfg))
    ts = 128 // 4
    cx = ts // 2  # coord/TILE = 0.5 -> diff == 0
    ref = np_lut_eval(np.asarray(px), np.asarray(py)[0, 0], float(recon[cx, cx]))
    assert abs(out[cx, cx] - ref) < 1e-5


def test_clahe_grade_dense_mask(rng):
    """With every tile populated the blended output is finite, monotone-ish
    in the input, and within [0, ~1]."""
    cfg = MusicaConfig(image_size=128, enable_clahe=True)
    recon = rng.uniform(0.05, 0.95, (128, 128)).astype(np.float32)
    relevant = np.ones((128, 128), np.float32)
    out = np.asarray(clahe.clahe_grade(jnp.asarray(recon),
                                       jnp.asarray(relevant), cfg))
    assert np.isfinite(out).all()
    assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-5


def test_clahe_end_to_end_runs(phantom_256):
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
    import jax
    cfg = MusicaConfig(image_size=256, enable_clahe=True)
    res = jax.jit(lambda im: musica.musica_forward(im, cfg))(jnp.asarray(phantom_256))
    cg = np.asarray(res["clahe_graded"])
    assert cg.shape == (256, 256)
    # the regular gradation output must be unaffected by the CLAHE branch
    base = jax.jit(lambda im: musica.musica_forward(
        im, cfg.with_(enable_clahe=False)))(jnp.asarray(phantom_256))
    np.testing.assert_array_equal(np.asarray(res["out_u8"]),
                                  np.asarray(base["out_u8"]))
