"""CLAHE-variant TPU bench: full pipeline with ENABLE_CLAHE on
(histograms -> clipped per-tile CDFs -> bilinear-blended apply on top of the
regular 7-phase pass), 3072^2, marginal-cost timing like bench.py.

Prints one JSON line mirroring bench.py's shape (separate metric name so the
driver's headline bench is untouched).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph

SIZE = 3072


def marginal_ms(fn, args, k=16, reps=5):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(fn(*a))))
    np.asarray(g(*args))

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


def main():
    img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
    cfg = MusicaConfig(image_size=SIZE, enable_clahe=True)

    def fwd(im):
        r = musica.musica_forward(im, cfg)
        return r["out_u8"], r["clahe_graded"]

    ms = marginal_ms(fwd, (img,))
    base_ms = marginal_ms(
        lambda im: musica.musica_forward(
            im, MusicaConfig(image_size=SIZE))["out_u8"], (img,))
    gpix = SIZE * SIZE / ms / 1e6
    print(json.dumps({
        "metric": "musica_clahe_3072_gpix_per_s",
        "value": round(gpix, 4), "unit": "GPix/s",
        "pipeline_ms": round(ms, 3),
        "clahe_overhead_ms": round(ms - base_ms, 3),
    }))


if __name__ == "__main__":
    main()
