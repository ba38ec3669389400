"""On-chip A/B: is there sustained-rate headroom past B=16 at 3072?

exp_interleave3 recorded B=16 g=4 as the best sustained rate
(3.619 ms/img); the B-scaling trend (3.675 @ B=4, 3.676 @ B=8,
3.619 @ B=16) had not clearly flattened.  This probes, in ONE process
(within-process A/Bs are the only trusted comparisons -- relay session
state swings process-to-process numbers +/-10-15%):

  * B=16 g=4  (shipped bench formulation, warm AOT entry) -- baseline,
    measured FIRST and LAST to gauge in-process drift;
  * B=32 g=4  (more groups to amortize map overhead);
  * B=16 g=2  (g sweep at B=16 only ever measured g=4).

    timeout 1800 python -u scripts/exp_batch32.py
    MUSICA_EXP_SIZE=512 ... (CPU smoke)
"""

import json
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
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils.aot_cache import cached_compile  # noqa: E402

SIZE = int(os.environ.get("MUSICA_EXP_SIZE", "3072"))
cfg = MusicaConfig(image_size=SIZE)
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", "exp_batch32.json")


from _timing import marginal_ms  # noqa: E402


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}", flush=True)
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    xb4 = jnp.stack(imgs)
    f1 = cached_compile(
        lambda a: (musica.musica_forward(a, cfg)["out_u8"]
                   .astype(jnp.uint32).sum()),
        key_parts=("bench", cfg), example_args=(imgs[0],), verbose=True)
    ref = sum(int(np.asarray(f1(im))) for im in imgs)
    results = {"device": str(dev), "size": SIZE}

    progs = {}
    for b, g in ((16, 4), (32, 4), (16, 2)):
        xb = jnp.concatenate([xb4] * (b // 4))
        fb = cached_compile(
            lambda a, g=g: musica.batch_checksum(a, cfg, interleave=g),
            key_parts=("bench_b", b, g, cfg), example_args=(xb,),
            verbose=True)
        chk = int(np.asarray(fb(xb)))
        assert chk == (b // 4 * ref) % (1 << 32), (b, g, chk, ref)
        progs[(b, g)] = (fb, xb)

    # baseline first and last to gauge in-process drift
    order = [(16, 4), (32, 4), (16, 2), (16, 4)]
    for idx, (b, g) in enumerate(order):
        fb, xb = progs[(b, g)]
        ms = marginal_ms(fb, (xb,), k=3) / b
        key = f"b{b}_g{g}_ms_per_img" + ("_rerun" if idx == 3 else "")
        results[key] = ms
        print(f"B={b} g={g}   {ms:7.3f} ms/img  "
              f"({SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
