"""Follow-up on-chip A/B: does a LARGER interleave group keep paying?

exp_interleave2 picked g=4 from {1,2,4} at B=4 and measured B=8 only at
g=4.  This measures B=8 at g=8 (one fully-interleaved map body) against
the shipped g=4, and B=16 at g=4 for the sustained-rate record.

    timeout 1800 python -u scripts/exp_interleave3.py
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
                   "artifacts", "exp_interleave3.json")


from _timing import marginal_ms  # noqa: E402


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}", flush=True)
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    xb4 = jnp.stack(imgs)
    xb8 = jnp.concatenate([xb4, xb4])
    f1 = cached_compile(
        lambda a: (musica.musica_forward(a, cfg)["out_u8"]
                   .astype(jnp.uint32).sum()),
        key_parts=("bench", cfg), example_args=(imgs[0],), verbose=True)
    ref = sum(int(np.asarray(f1(im))) for im in imgs)
    results = {"device": str(dev), "size": SIZE}

    for b, g in ((8, 4), (8, 8), (16, 4)):
        xb = jnp.concatenate([xb4] * (b // 4))
        fb = cached_compile(
            lambda a, g=g: musica.batch_checksum(a, cfg, interleave=g),
            key_parts=(f"bench_b{b}", g, cfg), example_args=(xb,),
            verbose=True)
        chk = int(np.asarray(fb(xb)))
        assert chk == (b // 4 * ref) % (1 << 32), (b, g, chk, ref)
        ms = marginal_ms(fb, (xb,), k=max(3, 32 // b)) / b
        results[f"b{b}_g{g}_ms_per_img"] = ms
        print(f"B={b} g={g}   {ms:7.3f} ms/img  "
              f"({SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
