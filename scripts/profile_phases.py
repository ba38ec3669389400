"""Per-phase marginal-cost profiling on the real TPU chip.

Methodology (docs/PERFORMANCE.md): the axon relay's block_until_ready does
not fence, and every host transfer costs ~30 ms fixed; so each phase jit is
timed as (time of K chained calls - time of 1 call) / (K - 1).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import (
    curves, gradation, noise, normalize, pyramid, stats)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))


def _checksum(out):
    leaves = jax.tree_util.tree_leaves(out)
    return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)


def marginal_ms(fn, args, k=24, reps=6):
    """Best-of marginal cost of one fn(*args) in ms.

    fn is wrapped so only a scalar checksum crosses the relay; the fence
    transfer is then bytes, not MBs, keeping variance << signal.
    """
    g = jax.jit(lambda *a: _checksum(fn(*a)))
    np.asarray(g(*args))  # warm + fence

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = g(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


# ---- phase jits (mirror the fused pipeline structure) ----------------------
@partial(jax.jit, static_argnames=("cfg",))
def p_norm(im, cfg=cfg):
    n, _, _ = normalize.normalize_from_u16(im, cfg.quirks)
    return n


@partial(jax.jit, static_argnames=("cfg",))
def p_reduce(nrm, cfg=cfg):
    return pyramid.reduce_ladder(nrm, cfg.pyramid_levels)


@partial(jax.jit, static_argnames=("cfg",))
def p_analysis(bandpass, cfg=cfg):
    sdevs = {i: stats.img_sdev(bandpass[i]) for i in cfg.analysis_levels}
    _, max_bins = stats.analysis_noise_hists(sdevs, cfg, "auto")
    return sdevs, max_bins


@partial(jax.jit, static_argnames=("cfg",))
def p_apply(bandpass, sdevs, max_bins, cfg=cfg):
    cnr = noise.img_cnr(sdevs[cfg.cnr_level], max_bins[cfg.cnr_level], cfg)
    ebs = []
    for i in range(cfg.pyramid_levels):
        lcf, hcf = cfg.contrast_factors[i]
        px, py = curves.contrast_curve(
            max_bins.get(i, jnp.zeros((), jnp.int32)), lcf, hcf, cfg)
        if i in sdevs:
            ebs.append(curves.contrast_curve_apply(bandpass[i], sdevs[i], px, py))
        else:
            ebs.append(bandpass[i] * jnp.float32(hcf))
    nr = {}
    for lvl in range(cfg.cnr_level):
        lo_c, lo_f, hi_c, hi_f = cfg.noise_reduction_params[lvl]
        nr[lvl] = noise.noise_reduction(ebs[lvl], cnr, lo_c, lo_f, hi_c, hi_f, cfg)
    return cnr, ebs, nr


@partial(jax.jit, static_argnames=("cfg",))
def p_expand(downs, ebs, nr, cfg=cfg):
    recon = downs[cfg.pyramid_levels - 1]
    for i in range(cfg.pyramid_levels):
        lvl = cfg.pyramid_levels - 1 - i
        low = pyramid.upsample_smooth(recon, ebs[lvl].shape[-1])
        band = nr[lvl] if lvl < cfg.cnr_level - 1 else ebs[lvl]
        recon = low + band
    return recon


@partial(jax.jit, static_argnames=("cfg",))
def p_grad(recon, nrm, cnr, cfg=cfg):
    gi = recon
    ghist = gradation.gradation_histogram_fused_relevance(gi, nrm, cnr, cfg, "auto")
    gpx, gpy, _ = gradation.gradation_curve(ghist, cfg)
    m = cfg.out_margin
    return curves.curve_apply_u8_adaptive(gpx, gpy, gi[..., m:-m, m:-m])


# sub-phase: gradation histogram only / tone map only
@partial(jax.jit, static_argnames=("cfg",))
def p_grad_hist(recon, nrm, cnr, cfg=cfg):
    return gradation.gradation_histogram_fused_relevance(recon, nrm, cnr, cfg, "auto")


@partial(jax.jit, static_argnames=("cfg",))
def p_tonemap(recon, gpx, gpy, cfg=cfg):
    m = cfg.out_margin
    return curves.curve_apply_u8_adaptive(gpx, gpy, recon[..., m:-m, m:-m])


# expand ladder top step only
@partial(jax.jit, static_argnames=("n",))
def p_expand_top(recon_half, band, n=SIZE):
    return pyramid.upsample_smooth(recon_half, n) + band


f_full = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                 .astype(jnp.uint32).sum())


def main():
    print("device:", jax.devices()[0])
    res = {}
    res["full"] = marginal_ms(f_full, (img,))

    nrm = p_norm(img)
    bandpass, downs = p_reduce(nrm)
    sdevs, max_bins = p_analysis(bandpass)
    cnr, ebs, nr = p_apply(bandpass, sdevs, max_bins)
    recon = p_expand(downs, ebs, nr)
    ghist = p_grad_hist(recon, nrm, cnr)
    gpx, gpy, _ = jax.jit(partial(gradation.gradation_curve, cfg=cfg))(ghist)

    res["norm"] = marginal_ms(p_norm, (img,))
    res["reduce"] = marginal_ms(p_reduce, (nrm,))
    res["analysis"] = marginal_ms(p_analysis, (bandpass,))
    res["apply"] = marginal_ms(p_apply, (bandpass, sdevs, max_bins))
    res["expand"] = marginal_ms(p_expand, (downs, ebs, nr))
    res["grad"] = marginal_ms(p_grad, (recon, nrm, cnr))
    res["grad_hist"] = marginal_ms(p_grad_hist, (recon, nrm, cnr))
    res["tonemap"] = marginal_ms(p_tonemap, (recon, gpx, gpy))
    res["expand_top"] = marginal_ms(p_expand_top, (downs[0], ebs[0]))

    for k, v in res.items():
        print(f"{k:12s} {v:7.3f} ms")
    tot = sum(res[k] for k in ("norm", "reduce", "analysis", "apply",
                               "expand", "grad"))
    print(f"{'sum-phases':12s} {tot:7.3f} ms (full fused = {res['full']:.3f})")


if __name__ == "__main__":
    main()
