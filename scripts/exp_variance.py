"""Is the ±0.5 ms process-to-process pipeline variance a COMPILE lottery or
device/relay state?  Within one process: compile the same program several
times (jax.clear_caches() between), measure each executable; if times
differ across recompiles, bench should keep the best executable."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

from profile_phases import marginal_ms  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)


def main():
    print("device:", jax.devices()[0])
    img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
    for rep in range(4):
        f = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                    .astype(jnp.uint32).sum())
        t0 = time.time()
        np.asarray(f(img))
        compile_s = time.time() - t0
        ms = marginal_ms(f, (img,))
        print(f"compile {rep}: {compile_s:6.1f} s  ->  {ms:7.3f} ms/img",
              flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
