"""One-off full-production-size parity stress: golden model vs jit at 3072.

PARITY.md pins 512-1024 sizes; this script runs the complete NumPy golden
oracle (models/golden.py) against the jit pipeline at the reference's
production size (3072, 12 pyramid levels -- test/standalone/main.cpp:31)
to confirm the quirk catalog (noise-hist coverage quirk #8 in particular)
holds at full scale.  Slow (minutes, NumPy f64 convolutions); run once per
round on the CPU backend:

  JAX_PLATFORMS=cpu python scripts/stress_golden_3072.py

Prints PSNR, bit-exact %, max abs u8 diff, and the golden-vs-jit equality
of histogram argmax bins and gradation window params, then a JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# CPU unless explicitly overridden: this environment PRESETS
# JAX_PLATFORMS=axon, so a setdefault would silently leave the run on the
# remote TPU tunnel (and hang when the tunnel is down).  Override with
# MUSICA_STRESS_PLATFORM=axon to stress on the real chip.
jax.config.update("jax_platforms",
                  os.environ.get("MUSICA_STRESS_PLATFORM", "cpu"))

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import (  # noqa: E402
    MusicaConfig,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import (  # noqa: E402
    golden,
    musica,
)
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import (  # noqa: E402
    synthetic_radiograph,
)


def main(size: int = 3072, anatomy: str = "thorax",
         clahe: bool = False, linear: bool = False,
         bf16: bool = False) -> None:
    cfg = MusicaConfig(image_size=size, enable_clahe=clahe,
                       grad_with_linear_image=linear,
                       storage="bfloat16" if bf16 else "float32")
    img = synthetic_radiograph(size, anatomy)
    print(f"size={size} anatomy={anatomy} levels={cfg.pyramid_levels} "
          f"clahe={clahe} linear={linear} bf16={bf16} "
          f"backend={jax.devices()[0].platform}")

    t0 = time.time()
    # the golden oracle is the f32-parity model; in bf16 mode the capture
    # below measures the fast mode's distance to that reference contract
    # (knife-edge count + inlier PSNR, verdict r4 item 3)
    g, g_inter = golden.process(img, cfg.with_(storage="float32"),
                                return_intermediates=True)
    t1 = time.time()
    print(f"golden: {t1 - t0:.1f}s")

    # the WHOLE pipeline as one jitted program -- the thing production runs
    # (whole-program fusion/FMA-contraction effects are exactly what this
    # stress exists to catch); only the compared outputs are returned so
    # XLA dead-code-eliminates the rest
    keys = ("out_u8", "clahe_graded") if clahe else ("out_u8",)
    fwd = jax.jit(lambda im: {k: musica.musica_forward(im, cfg)[k]
                              for k in keys})
    res = jax.device_get(fwd(img))
    j = np.asarray(res["out_u8"])
    t2 = time.time()
    print(f"jit:    {t2 - t1:.1f}s")

    diff = g.astype(np.int32) - j.astype(np.int32)
    bit_exact = float((diff == 0).mean())
    max_abs = int(np.abs(diff).max())
    mse = float((diff.astype(np.float64) ** 2).mean())
    psnr = float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    print(f"PSNR={psnr:.1f} dB  bit-exact={bit_exact:.6%}  max|diff|={max_abs}")

    out = {"size": size, "anatomy": anatomy, "psnr_db": round(psnr, 1),
           "bit_exact_pct": round(bit_exact * 100, 4), "max_abs_u8": max_abs}
    if bf16:
        # the bf16 contract decomposition (tests/test_bf16.py): full-scale
        # knife flips of the out-of-curve getY zero vs bounded inliers
        d = np.abs(diff)
        knife = d > 32
        inlier = d[~knife].astype(np.float64)
        imse = float((inlier ** 2).mean())
        out["knife_edge_pixels"] = int(knife.sum())
        out["max_inlier_abs"] = int(inlier.max()) if inlier.size else 0
        out["inlier_psnr_db"] = (None if imse == 0 else
                                 round(10 * np.log10(255.0 ** 2 / imse), 1))
    if clahe:
        # empty tiles (inside the relevance border) are NaN in BOTH
        # implementations (0/0 CDF, reference-faithful): require identical
        # NaN masks and compare the finite rest
        ja, ga = np.asarray(res["clahe_graded"]), g_inter["clahe_graded"]
        jn, gn = np.isnan(ja), np.isnan(ga)
        cd = np.abs(np.where(jn | gn, 0.0, ja - ga))
        out["clahe_nan_masks_equal"] = bool(np.array_equal(jn, gn))
        # max-abs alone is misleading here: CLAHE quantizes recon with a
        # hard int(x*255+0.5), so the f32 recon tail (~1e-3..6e-3 at the
        # worst pixels of a 12-level f32 pyramid vs the f64 oracle) flips
        # a bin on knife-edge pixels and jumps one tile-CDF step -- a
        # program-/data-dependent outlier on a handful of pixels, not a
        # systematic LUT error.  Record the tail counts for context.
        out["clahe_max_abs_finite"] = float(cd.max())
        out["clahe_px_gt_1e2"] = int((cd > 1e-2).sum())
        out["clahe_px_gt_1e1"] = int((cd > 1e-1).sum())
    # size-aware name on EVERY path: a reduced-size smoke run must never
    # clobber the committed full-size artifact
    variant = (("clahe" if clahe else "") + ("linear" if linear else "")
               + ("bf16" if bf16 else ""))
    name = f"stress_golden_{size}{'_' + variant if variant else ''}.json"
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    main(*(int(a) if a.isdigit() else a for a in args),
         clahe="--clahe" in flags, linear="--linear" in flags,
         bf16="--bf16" in flags)
