"""On-chip validation of non-default configs via the REAL TPU dispatch path.

The CPU test backend's 'auto' histogram dispatch avoids Pallas entirely, so
the config-fuzz parity suite (tests/test_config_fuzz.py) never executes the
TPU kernel-selection logic it is guarding -- the same blind spot that hid
the round-3 `check_vma` bug until hardware ran it.  This runs the fuzz
suite's most TPU-divergent cases on the real chip with hist_method='auto'
and compares against the NumPy golden oracle:

  * noise_histogram_bins=2000: not factorizable by the multi-level kernel's
    C=32 scheme -> must take the per-level fused fallback (the round-3
    advisor regression) INSIDE a real Mosaic compile;
  * coarser_levels_start=2 / cnr_level=2: different analysis-level set ->
    different per-level kernel instantiations;
  * enable_clahe + grad_with_linear_image at 576: the fused CLAHE MXU
    apply kernel and the coverage quirk together.

    timeout 1800 python -u scripts/exp_tpu_fuzz.py
    MUSICA_EXP_PLATFORM=cpu ... (smoke)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

_plat = os.environ.get("MUSICA_EXP_PLATFORM")
if _plat:
    jax.config.update("jax_platforms", _plat)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import golden, musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "exp_tpu_fuzz.json")

CASES = [
    ("bins2000", dict(image_size=512, noise_histogram_bins=2000,
                      grad_histogram_bins=1000)),
    ("structural", dict(image_size=512, coarser_levels_start=2, cnr_level=2)),
    ("clahe_linear_576", dict(image_size=576, enable_clahe=True,
                              grad_with_linear_image=True)),
]


def psnr(a, b):
    d = a.astype(np.float64) - b.astype(np.float64)
    mse = (d * d).mean()
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}", flush=True)
    # a CPU smoke run must not clobber the committed ON-CHIP capture
    out = OUT if dev.platform == "tpu" else OUT.replace(
        ".json", f"_{dev.platform}.json")
    results = {"device": str(dev)}
    for name, kw in CASES:
        cfg = MusicaConfig(**kw)
        img = synthetic_radiograph(cfg.image_size, "thorax")
        # one jitted whole-pipeline program per case (what production runs:
        # kernel selection AND whole-program Mosaic/XLA interactions); only
        # the compared outputs are kept so XLA DCEs the rest
        keys = ("out_u8", "clahe_graded") if cfg.enable_clahe else ("out_u8",)
        fwd = jax.jit(lambda im, c=cfg, ks=keys: {
            k: musica.musica_forward(im, c, "auto")[k] for k in ks})
        res = jax.device_get(fwd(jnp.asarray(img)))
        j_out = np.asarray(res["out_u8"])  # fences the dispatch
        g_out, g_inter = golden.process(img, cfg, return_intermediates=True)
        p = psnr(j_out, g_out)
        eq = float(np.mean(j_out == g_out))
        rec = {"psnr_db": round(p, 1), "bit_exact_pct": round(eq * 100, 4)}
        nan_ok = True
        if cfg.enable_clahe:
            # tiles fully inside the 100-px relevance border are empty ->
            # 0/0 CDFs -> NaN in BOTH implementations (reference-faithful);
            # require identical NaN masks and compare the finite rest
            ja = np.asarray(res["clahe_graded"])
            ga = np.asarray(g_inter["clahe_graded"])
            jn, gn = np.isnan(ja), np.isnan(ga)
            nan_ok = bool(np.array_equal(jn, gn))
            cd = float(np.abs(np.where(jn | gn, 0.0, ja - ga)).max())
            rec["clahe_max_abs_finite"] = cd
            rec["clahe_nan_frac"] = round(float(jn.mean()), 6)
            rec["clahe_nan_masks_equal"] = nan_ok
        results[name] = rec
        ok = (p > 55.0 and eq > 0.98 and nan_ok
              and rec.get("clahe_max_abs_finite", 0.0) < 1e-5)
        print(f"{name:18s} PSNR={p:6.1f} dB  bit-exact={eq:.4%}  "
              f"{'OK' if ok else 'FAIL'}", flush=True)
        assert ok, (name, rec)
        with open(out, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {out}", flush=True)


if __name__ == "__main__":
    main()
