"""Round 2 of the in-context blowup probes (see exp_fusion.py).

Findings so far: lax.cond tone map costs ~0.3 (crop operand materialized
across the cond boundary), sdev0 barrier helps ~0.15 (recompute into the
apply chain), contrast chains cost ~1.33 in-context (vs 0.33 standalone) --
consistent with chain recompute inside the polyphase upsample taps of the
expand ladder at L1/L2 (nested, since each recon level fuses upward).

Variants:
  recon_barrier  -- materialize recon at EVERY expand level before the next
                    upsample (stencil taps then read memory instead of
                    recomputing the fused band/chain producers)
  band_barrier   -- materialize just the stencil-adjacent small bands
                    (nr[1], exp_bandpass[2]) -- narrower version
  tm_crop_inside -- pass full grad_input into the cond, crop inside the
                    branches (avoids the 3052^2 operand copy)
  sd_barrier     -- replicate exp_fusion's +0.145
  combo          -- recon_barrier + tm_crop_inside + sd_barrier
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


def tonemap_crop_inside(px, py, full, m):
    def quant(g):
        return jnp.clip(jnp.trunc(F32(255.0) * g), 0.0, 255.0).astype(jnp.uint8)

    monotone = jnp.all(px[1:] >= px[:-1])
    return lax.cond(
        monotone,
        lambda args: quant(curves.curve_get_y_sorted(
            args[0], args[1], args[2][..., m:-m, m:-m])),
        lambda args: quant(curves.curve_get_y(
            args[0], args[1], args[2][..., m:-m, m:-m])),
        (px, py, full))


def forward(im, *, modes=frozenset()):
    L = cfg.pyramid_levels
    normalized, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    bandpass, downs = pyramid.reduce_ladder(normalized, L)
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    if "sd_barrier" in modes:
        sdevs[0] = lax.optimization_barrier(sdevs[0])
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
    if "band_barrier" in modes:
        nr_bandpass[1] = lax.optimization_barrier(nr_bandpass[1])
        exp_bandpass[2] = lax.optimization_barrier(exp_bandpass[2])
    recon = downs[L - 1]
    for i in range(L):
        lvl = L - 1 - i
        if "recon_barrier" in modes and i > 0:
            recon = lax.optimization_barrier(recon)
        low = pyramid.upsample_smooth(recon, bandpass[lvl].shape[-1])
        band = (nr_bandpass[lvl] if lvl < cfg.cnr_level - 1
                else exp_bandpass[lvl])
        recon = low + band
    ghist = gradation.gradation_histogram_fused_relevance(
        recon, normalized, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    if "tm_crop_inside" in modes:
        out = tonemap_crop_inside(gpx, gpy, recon, m)
    else:
        out = curves.curve_apply_u8_adaptive(gpx, gpy,
                                             recon[..., m:-m, m:-m])
    return jnp.sum(out.astype(jnp.uint32))


def main():
    print("device:", jax.devices()[0])
    base = None
    cases = (("baseline", ()),
             ("recon_barrier", ("recon_barrier",)),
             ("band_barrier", ("band_barrier",)),
             ("tm_crop_inside", ("tm_crop_inside",)),
             ("sd_barrier", ("sd_barrier",)),
             ("combo", ("recon_barrier", "tm_crop_inside", "sd_barrier")),
             ("base_re", ()))
    outs = {}
    for tag, modes in cases:
        f = jax.jit(partial(forward, modes=frozenset(modes)))
        outs[tag] = np.asarray(jax.jit(
            partial(forward, modes=frozenset(modes)))(img))
        ms = marginal_ms(f, (img,))
        if base is None:
            base = ms
            print(f"{tag:16s} {ms:7.3f} ms")
        else:
            eq = outs[tag] == outs["baseline"]
            print(f"{tag:16s} {ms:7.3f} ms  delta {base - ms:+6.3f}  "
                  f"checksum_equal={bool(np.all(eq))}")


if __name__ == "__main__":
    main()
