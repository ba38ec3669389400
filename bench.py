"""Headline benchmark: full MUSICA pipeline throughput on one chip.

Prints ONE JSON line:
  {"metric": "musica_3072_gpix_per_s", "value": N, "unit": "GPix/s",
   "vs_baseline": N / 2.0}

Baseline: the reference publishes no end-to-end numbers (BASELINE.md); the
north-star target is 2 GPix/s/chip on a 16-bit 3000x3000 radiograph.

Timing methodology: the axon TPU relay makes block_until_ready unreliable,
so every iteration is fenced by a host transfer of a scalar checksum.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph

    size = 3072
    cfg = MusicaConfig(image_size=size)
    img = synthetic_radiograph(size, "thorax")
    x = jnp.asarray(img)

    f = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                .astype(jnp.uint32).sum())
    np.asarray(f(x))  # compile + warm

    # measure the repeat-cost of K pipeline invocations against K=1 to
    # subtract the fixed host<->device round-trip overhead of the relay;
    # K=25 with best-of-6 keeps single relay hiccups out of the estimate
    # (same methodology as scripts/profile_phases.py)
    def timed(k):
        best = float("inf")
        for _ in range(6):
            t0 = time.perf_counter()
            s = None
            for _ in range(k):
                s = f(x)
            np.asarray(s)
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tk = timed(25)
    per_iter = max((tk - t1) / 24.0, 1e-9)
    # guard: if the marginal estimate is nonsensical, fall back to t1
    if per_iter <= 0 or per_iter > t1:
        per_iter = t1
    gpix = size * size / per_iter / 1e9
    print(json.dumps({
        "metric": "musica_3072_gpix_per_s",
        "value": round(gpix, 4),
        "unit": "GPix/s",
        "vs_baseline": round(gpix / 2.0, 4),
    }))


if __name__ == "__main__":
    main()
