"""Single-chip lax.map batch-size sweep.

exp_batch.py established lax.map >> vmap at B=4 (1.09x vs 0.62x of the
single-image rate).  This sweeps B in {2, 4, 8} with the CURRENT kernels to
check whether a larger sequential batch amortizes per-image dispatch gaps
further -- if B=8 beats B=4, bench.py's batch sample should use it.
HBM check: the fused single-image program peaks well under 2 GB, so even
B=8 uint16 inputs (151 MB) plus one in-flight working set fit v5e's 16 GB.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
rng = np.random.default_rng(0)


def marginal_ms(fn, args, k=8, reps=6):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.uint32)))
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
    print("device:", jax.devices()[0])
    one = lambda im: musica.musica_forward(im, cfg)["out_u8"]  # noqa: E731

    img1 = jnp.asarray(rng.integers(0, 65535, (SIZE, SIZE), dtype=np.uint16))
    t_single = marginal_ms(one, (img1,), k=25)
    r_single = SIZE * SIZE / t_single / 1e6
    print(f"single image: {t_single:7.2f} ms -> {r_single:.2f} GPix/s",
          flush=True)

    for B in (2, 4, 8):
        imgs = jnp.asarray(
            rng.integers(0, 65535, (B, SIZE, SIZE), dtype=np.uint16))
        t = marginal_ms(lambda ims: jax.lax.map(one, ims), (imgs,))
        gp = B * SIZE * SIZE / t / 1e6
        print(f"lax.map B={B}: {t:7.2f} ms -> {gp:.2f} GPix/s "
              f"({gp / r_single:.2f}x single rate)", flush=True)


if __name__ == "__main__":
    main()
