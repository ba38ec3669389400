"""On-chip sweep: does the bf16 band-storage mode prefer a different
(B, g) batch shape than f32's measured-best B=16 g=4?

bf16 halves the band-stream HBM bytes, which shifts the memory/schedule
balance the f32 sweeps were tuned against (exp_interleave*.py,
exp_batch32.py: f32 plateaued at B=16 g=4 with B=32 and g=2 inside the
drift).  One process, f32-best-shape bf16 baseline first AND last:

    timeout 3600 python -u scripts/exp_bf16_shapes.py
    MUSICA_EXP_SIZE=512 ... (CPU smoke)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils.aot_cache import cached_compile  # noqa: E402

from _timing import marginal_ms  # noqa: E402

SIZE = int(os.environ.get("MUSICA_EXP_SIZE", "3072"))
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", f"exp_bf16_shapes_{SIZE}.json"
                   if SIZE != 3072 else "exp_bf16_shapes.json")

# (B, g) candidates: f32-best first (the baseline, repeated last); g=8
# (deeper interleave now that bands are half-width), B=32 g=4 (more
# batch in the freed memory)
SHAPES = [(16, 4), (16, 8), (32, 4), (16, 2)]


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}", flush=True)
    cfg = MusicaConfig(image_size=SIZE, storage="bfloat16")
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    results = {"device": str(dev), "size": SIZE, "storage": "bfloat16"}

    fns = {}
    for B, g in SHAPES:
        xb = jnp.concatenate([jnp.stack(imgs)] * (B // 4))
        fns[(B, g)] = (cached_compile(
            lambda a, g=g: musica.batch_checksum(a, cfg, interleave=g),
            key_parts=("bench_b", B, g, cfg), example_args=(xb,),
            verbose=True), xb)

    order = SHAPES + [SHAPES[0]]  # baseline rerun to bracket drift
    for i, (B, g) in enumerate(order):
        fn, xb = fns[(B, g)]
        ms = marginal_ms(fn, (xb,), k=3) / B
        key = f"B{B}_g{g}" + ("_rerun" if i == len(order) - 1 else "")
        results[key + "_ms_per_img"] = round(ms, 4)
        print(f"{key:14s} {ms:7.3f} ms/img  "
              f"({SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
