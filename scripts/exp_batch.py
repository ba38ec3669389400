import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from functools import partial
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica

SIZE = 3072
B = 4
cfg = MusicaConfig(image_size=SIZE)
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 65535, (B, SIZE, SIZE), dtype=np.uint16))

def marginal_ms(fn, args, k=8, reps=4):
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

one = lambda im: musica.musica_forward(im, cfg)["out_u8"]

t_single = marginal_ms(one, (imgs[0],))
print(f"single image: {t_single:7.2f} ms -> {SIZE*SIZE/t_single/1e6:.2f} GPix/s")

variants = {
    "vmap": lambda ims: jax.vmap(one)(ims),
    "lax.map": lambda ims: jax.lax.map(one, ims),
    "unrolled": lambda ims: jnp.stack([one(ims[i]) for i in range(B)]),
}
for name, f in variants.items():
    try:
        t = marginal_ms(f, (imgs,))
        gp = B * SIZE * SIZE / t / 1e6
        print(f"{name:10s} B={B}: {t:7.2f} ms -> {gp:.2f} GPix/s "
              f"({gp / (SIZE*SIZE/t_single/1e6):.2f}x single rate)")
    except Exception as e:
        print(f"{name:10s}: FAILED {type(e).__name__}: {str(e)[:120]}")
