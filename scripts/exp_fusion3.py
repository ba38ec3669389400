"""Branchless general getY vs the lax.cond adaptive tone map.

exp_fusion.py measured the runtime lax.cond at ~0.3 ms (tm_nocond), and
exp_fusion2.py showed it is NOT the operand crop copy.  Candidate
replacement: a FIRST-match scalar-select chain faithful for ARBITRARY px --
descending overwrite picks the smallest matching interval (= the GLSL
scan's first match); a non-increasing pair (px[i+1] <= px[i], where the
GLSL interval test can never fire but its exact test can) becomes a
zero-width interval at px[i] via a precomputed scalar upper bound, and
slope sanitization (m := 0 there) makes the exact-match branch's value
py[i] fall out of the same lerp.  6 ops/interval, no cond.
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: E402
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
F32 = jnp.float32


def curve_get_y_general(px, py, x):
    """First-match getY for arbitrary px as a branchless descending chain."""
    n = px.shape[0]
    px_e = jnp.concatenate([px, jnp.zeros((1,), F32)])
    py_e = jnp.concatenate([py, jnp.zeros((1,), F32)])
    x = x.astype(F32)
    ms = (py_e[1:] - py_e[:-1]) / (px_e[1:] - px_e[:-1])
    nonmono = px_e[1:] <= px_e[:-1]
    m_safe = jnp.where(nonmono, F32(0.0), ms)
    px_hi = jnp.where(nonmono, px_e[:-1], px_e[1:])

    sel_m = F32(0.0) * jnp.ones((), F32)
    sel_px = F32(0.0)
    sel_py = F32(0.0)
    sm, spx, spy = (jnp.zeros_like(x), jnp.zeros_like(x), jnp.zeros_like(x))
    for i in range(n - 1, -1, -1):
        hit = (px_e[i] <= x) & (x <= px_hi[i])
        sm = jnp.where(hit, m_safe[i], sm)
        spx = jnp.where(hit, px_e[i], spx)
        spy = jnp.where(hit, py_e[i], spy)
    return sm * (x - spx) + spy


def forward(im, *, mode=""):
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    _, max_bins = stats.analysis_noise_hists(sdevs, cfg, "auto")
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
    recon = downs[L - 1]
    for i in range(L):
        lvl = L - 1 - i
        low = pyramid.upsample_smooth(recon, bandpass[lvl].shape[-1])
        band = (nr_bandpass[lvl] if lvl < cfg.cnr_level - 1
                else exp_bandpass[lvl])
        recon = low + band
    ghist = gradation.gradation_histogram_fused_relevance(
        recon, normalized, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    cropped = recon[..., m:-m, m:-m]
    if mode == "tm_general":
        g = curve_get_y_general(gpx, gpy, cropped)
        out = jnp.clip(jnp.trunc(F32(255.0) * g), 0.0, 255.0).astype(jnp.uint8)
    else:
        out = curves.curve_apply_u8_adaptive(gpx, gpy, cropped)
    return jnp.sum(out.astype(jnp.uint32))


def main():
    # (bit-equivalence vs curve_get_y verified CPU-side over 400 adversarial
    # curves -- fold-backs, duplicates, exact boundaries; see
    # tests/test_ops_golden.py once productionized)
    print("device:", jax.devices()[0])
    base = None
    for tag, mode in (("baseline", ""), ("tm_general", "tm_general"),
                      ("base_re", "")):
        f = jax.jit(partial(forward, mode=mode))
        out = np.asarray(jax.jit(partial(forward, mode=mode))(img))
        ms = marginal_ms(f, (img,))
        if base is None:
            base = ms
            ref = out
            print(f"{tag:12s} {ms:7.3f} ms")
        else:
            print(f"{tag:12s} {ms:7.3f} ms  delta {base - ms:+6.3f}  "
                  f"checksum_equal={bool(np.all(out == ref))}")


if __name__ == "__main__":
    main()
