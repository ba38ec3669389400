"""On-chip A/B: does bf16 storage of the stage images beat the f32 plateau?

The sustained rate has plateaued at ~3.63-3.68 ms/img (2.56-2.60 GPix/s)
with every schedule-level candidate measured inside the in-process drift
(docs/PERFORMANCE.md).  The remaining lever is HBM bytes: the memory-bound
ladders run at 40-50% of their f32 HBM light-speed, and storage="bfloat16"
(config.py) halves the bytes of every large stage image while keeping the
analysis path f32.

One process (within-process A/Bs only -- relay sessions swing +/-10-15%):

  * f32  B=16 g=4  batch checksum -- baseline, measured FIRST and LAST
    (same AOT-cache keys as bench.py, so this run also primes the bench);
  * bf16 B=16 g=4  batch checksum;
  * f32 / bf16 single-image out_u8 -- marginal cost + the 3072 diff
    profile (frac bit-identical, knife-edge count, inlier PSNR).

    timeout 3600 python -u scripts/exp_bf16.py
    MUSICA_EXP_SIZE=512 ... (CPU smoke)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils.aot_cache import cached_compile  # noqa: E402

from _timing import marginal_ms  # noqa: E402

SIZE = int(os.environ.get("MUSICA_EXP_SIZE", "3072"))
B, G = 16, musica.DEFAULT_INTERLEAVE
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts",
                   f"exp_bf16_{SIZE}.json" if SIZE != 3072 else "exp_bf16.json")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}  B={B} g={G}", flush=True)
    cfg32 = MusicaConfig(image_size=SIZE)
    cfg16 = cfg32.with_(storage="bfloat16")
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    xb = jnp.concatenate([jnp.stack(imgs)] * (B // 4))
    results = {"device": str(dev), "size": SIZE, "batch": B, "interleave": G}

    # single-image out_u8 programs (diff profile + single marginals)
    u8 = {}
    for name, cfg in (("f32", cfg32), ("bf16", cfg16)):
        u8[name] = cached_compile(
            lambda a, cfg=cfg: musica.musica_forward(a, cfg)["out_u8"],
            key_parts=("u8", cfg), example_args=(imgs[0],), verbose=True)
    o32 = np.asarray(u8["f32"](imgs[0])).astype(np.int32)
    o16 = np.asarray(u8["bf16"](imgs[0])).astype(np.int32)
    d = np.abs(o32 - o16)
    knife = d > 32
    inlier = d[~knife].astype(np.float64)
    mse = (inlier ** 2).mean()
    results["diff"] = {
        "frac_bit_identical": float((d == 0).mean()),
        "frac_gt1": float((d > 1).mean()),
        "knife_edge_pixels": int(knife.sum()),
        "inlier_psnr_db": (None if mse == 0
                           else round(10 * np.log10(255.0 ** 2 / mse), 2)),
        "max_inlier_abs": int(inlier.max()) if inlier.size else 0,
    }
    print("diff profile:", results["diff"], flush=True)
    assert ((d <= 1) | knife).all(), "bf16 inliers exceed 1 LSB"

    # batch programs -- f32 uses bench.py's exact cache keys (priming)
    fb32 = cached_compile(
        lambda a: musica.batch_checksum(a, cfg32, interleave=G),
        key_parts=("bench_b", B, G, cfg32), example_args=(xb,), verbose=True)
    f132 = cached_compile(
        lambda a: (musica.musica_forward(a, cfg32)["out_u8"]
                   .astype(jnp.uint32).sum()),
        key_parts=("bench", cfg32), example_args=(imgs[0],), verbose=True)
    fb16 = cached_compile(
        lambda a: musica.batch_checksum(a, cfg16, interleave=G),
        key_parts=("bench_b", B, G, cfg16), example_args=(xb,), verbose=True)
    f116 = cached_compile(
        lambda a: (musica.musica_forward(a, cfg16)["out_u8"]
                   .astype(jnp.uint32).sum()),
        key_parts=("bench", cfg16), example_args=(imgs[0],), verbose=True)

    order = [("f32_batch", fb32, xb, B), ("bf16_batch", fb16, xb, B),
             ("f32_single", f132, imgs[0], 1),
             ("bf16_single", f116, imgs[0], 1),
             ("f32_batch_rerun", fb32, xb, B)]
    for name, fn, arg, n in order:
        ms = marginal_ms(fn, (arg,), k=3 if n > 1 else 25) / n
        results[name + "_ms_per_img"] = round(ms, 4)
        print(f"{name:18s} {ms:7.3f} ms/img  "
              f"({SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
