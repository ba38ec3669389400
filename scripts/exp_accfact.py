"""A/B the _accumulate_fact variants on the real chip: per-kernel cost of
the full-coverage noise hist (3072 rows) and the fused-relevance grad hist,
plus exact-parity checks against the XLA 'fact' path."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import gradation, stats

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)
rng = np.random.default_rng(5)

sd0 = rng.uniform(0, 0.12, (SIZE, SIZE)).astype(np.float32)
sd0[rng.uniform(size=(SIZE, SIZE)) < 0.05] = 0.0
sd0 = jnp.asarray(sd0)

recon = jnp.asarray(rng.uniform(0, 1.0, (SIZE, SIZE)).astype(np.float32))
nrm = jnp.asarray(rng.uniform(0, 1.01, (SIZE, SIZE)).astype(np.float32))
cnr = jnp.asarray(rng.uniform(0, 0.1, (384, 384)).astype(np.float32))


def f_hist0(sd):
    return stats.noise_histogram(sd, cfg, "fused")


def f_grad(recon, nrm, cnr):
    return gradation.gradation_histogram_fused_relevance(recon, nrm, cnr, cfg, "auto")


def main():
    print("device:", jax.devices()[0])
    h_fused = np.asarray(jax.jit(f_hist0)(sd0))
    h_fact = np.asarray(jax.jit(lambda s: stats.noise_histogram(s, cfg, "fact"))(sd0))
    print("noise parity:", "OK" if np.array_equal(h_fused, h_fact) else "MISMATCH")
    g_fused = np.asarray(jax.jit(f_grad)(recon, nrm, cnr))
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops import noise
    rel = jax.jit(lambda n, c: noise.img_relevant(n, c, cfg))(nrm, cnr)
    g_fact = np.asarray(jax.jit(
        lambda r, rl: gradation.gradation_histogram(r, rl, cfg, "fact"))(recon, rel))
    print("grad parity:", "OK" if np.array_equal(g_fused, g_fact) else "MISMATCH")

    print(f"hist0      {marginal_ms(f_hist0, (sd0,)):7.3f} ms")
    print(f"grad_hist  {marginal_ms(f_grad, (recon, nrm, cnr)):7.3f} ms")


if __name__ == "__main__":
    main()
