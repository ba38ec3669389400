"""Probe the apply-chain in-context slowdown (1.33 ms in-context vs 0.33
standalone; HLO shows each chain is ONE self-contained 349-op fusion with
~97 scalar params, no duplication).

Variants:
  ap_split    -- optimization_barrier on the running select triple halfway
                 through the L0-L3 chains: splits each mega-fusion in two
  ap_split3   -- two barriers -> three fusions
  ap_chain9   -- chains truncated to 9 intervals (WRONG output, cost-model
                 only): does in-context cost scale with interval count?
  ap_chain17  -- 17 intervals (cost model)
"""

import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (  # noqa: E402
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
F32 = jnp.float32


def chain_variant(px, py, x, mode):
    n = px.shape[0]
    if mode == "ap_chain9":
        n = 10
    elif mode == "ap_chain17":
        n = 18
    lt = [px[i] < x for i in range(n)]
    ms = (py[1:] - py[:-1]) / (px[1:] - px[:-1])
    m_s, px_s, py_s = ms[0], px[0], py[0]
    barriers = ()
    if mode == "ap_split":
        barriers = (n // 2,)
    elif mode == "ap_split3":
        barriers = (n // 3, 2 * n // 3)
    sel = None
    for i in range(1, n - 1):
        m_s = jnp.where(lt[i], ms[i], m_s)
        px_s = jnp.where(lt[i], px[i], px_s)
        py_s = jnp.where(lt[i], py[i], py_s)
        if i in barriers:
            m_s, px_s, py_s = lax.optimization_barrier((m_s, px_s, py_s))
    result = m_s * (x - px_s) + py_s
    result = jnp.where(lt[0], result,
                       jnp.where(x == px[0], py[0], F32(0.0)))
    return jnp.where(lt[n - 1], F32(0.0), result)


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
            if mode:
                eb = bandpass[i] * chain_variant(px, py, sdevs[i], mode)
            else:
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
    out = curves.curve_apply_u8_adaptive(gpx, gpy, recon[..., m:-m, m:-m])
    return jnp.sum(out.astype(jnp.uint32))


def main():
    print("device:", jax.devices()[0])
    base = None
    ref = None
    for tag in ("baseline", "ap_split", "ap_split3", "ap_chain17",
                "ap_chain9", "base_re"):
        mode = "" if tag in ("baseline", "base_re") else tag
        f = jax.jit(partial(forward, mode=mode))
        out = np.asarray(f(img))
        ms = marginal_ms(f, (img,))
        if base is None:
            base, ref = ms, out
            print(f"{tag:12s} {ms:7.3f} ms")
        else:
            print(f"{tag:12s} {ms:7.3f} ms  delta {base - ms:+6.3f}  "
                  f"checksum_equal={bool(np.all(out == ref))}")


if __name__ == "__main__":
    main()
