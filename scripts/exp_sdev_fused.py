"""Experiment record: fuse img_sdev (5x5 RMS) INTO the noise histogram
kernel (ops/pallas/fused_hist.py::sdev_noise_hist_fused) so the histogram
never re-reads the sdev image from HBM.

Outcome (TPU v5e, 3072², docs/PERFORMANCE.md "Negative results"):
  * standalone: 2.5x faster than the two-step path (0.39 vs 0.96 ms),
    BIT-identical histogram AND sdev output;
  * in the full pipeline: a net ~0.4 ms LOSS -- downstream consumers of a
    Pallas-produced sdev (contrast-apply getY + expand ladder) lose XLA
    fusion/layout freedom worth more than the saved HBM pass.
The kernel is kept as opt-in `method="fused_sdev"` in
stats.sdev_and_noise_histogram for histogram-only consumers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import stats
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.fused_hist import sdev_noise_hist_fused


def marginal_ms(fn, args, k=24, reps=5):
    g = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32))
                               for x in jax.tree_util.tree_leaves(fn(*a))))
    np.asarray(g(*args))

    def run(nn):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(nn):
                out = g(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 3072
    band = jnp.asarray(rng.normal(0, 0.02, (n, n)).astype(np.float32))
    cfg = MusicaConfig(image_size=n)

    def two_step(b):
        sd = stats.img_sdev(b)
        return sd, stats.noise_histogram(sd, cfg, "fused")

    def combined(b):
        h, sd = sdev_noise_hist_fused(b)
        return sd, h

    sd_ref, h_ref = jax.jit(two_step)(band)
    sd, h = combined(band)
    print("sdev exact:", np.array_equal(np.asarray(sd), np.asarray(sd_ref)),
          " hist exact:", np.array_equal(np.asarray(h), np.asarray(h_ref)))
    t_two = marginal_ms(two_step, (band,))
    t_fused = marginal_ms(combined, (band,))
    print(f"two-step sdev+hist: {t_two:7.3f} ms   sdev-fused: {t_fused:7.3f} ms")


if __name__ == "__main__":
    main()
