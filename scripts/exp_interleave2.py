"""On-chip A/B for the PRODUCTION batch path: process_batch_jit's
interleave g in {1, 2, 4} at 3072, B=4 (+ B=8 with the winner).

Round-3 context: exp_interleave.py showed the strictly-sequential lax.map
body exposes ~0.5 ms/img of inter-fusion schedule bubbles that interleaved
(multi-traced) bodies can hide; this measures the EXACT production
formulation (models/musica.py::batch_checksum == process_batch_jit's map
structure with a scalar checksum fence) so the winner can be shipped as
musica.DEFAULT_INTERLEAVE.

Every program goes through utils/aot_cache.cached_compile with the SAME
key bench.py uses ("bench" / ("bench_b4", g, cfg)), so this run also
PRIMES the benchmark's executable cache -- a later bench.py child (or the
driver's run) skips the multi-minute remote compile -- and a dropped
tunnel mid-experiment costs only the unfinished measurement, not the
finished compiles.

    timeout 1800 python -u scripts/exp_interleave2.py
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
                   "artifacts", "exp_interleave2.json")


from _timing import marginal_ms  # noqa: E402


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}", flush=True)
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    x = imgs[0]
    xb4 = jnp.stack(imgs)
    results = {"device": str(dev), "size": SIZE}

    # single-image program (the bench.py "bench" key -- primes it too)
    f1 = cached_compile(
        lambda a: (musica.musica_forward(a, cfg)["out_u8"]
                   .astype(jnp.uint32).sum()),
        key_parts=("bench", cfg), example_args=(x,), verbose=True)
    ref = [int(np.asarray(f1(im))) for im in imgs]
    ms1 = marginal_ms(f1, (x,), k=25)
    results["single_ms"] = ms1
    print(f"single      {ms1:7.3f} ms/img "
          f"({SIZE * SIZE / ms1 / 1e6:.2f} GPix/s)", flush=True)

    best_g, best_ms = 1, float("inf")
    for g in (1, 2, 4):
        fb = cached_compile(
            lambda a, g=g: musica.batch_checksum(a, cfg, interleave=g),
            key_parts=("bench_b4", g, cfg), example_args=(xb4,), verbose=True)
        chk = int(np.asarray(fb(xb4)))
        # the device checksum is uint32 and wraps; compare mod 2**32
        assert chk == sum(ref) % (1 << 32), (g, chk, sum(ref))
        ms = marginal_ms(fb, (xb4,), k=8) / 4
        results[f"b4_g{g}_ms_per_img"] = ms
        print(f"B=4 g={g}    {ms:7.3f} ms/img  ({ms1 / ms:.3f}x single, "
              f"{SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        if ms < best_ms:
            best_g, best_ms = g, ms
        with open(OUT, "w") as f:  # persist after every measurement
            json.dump(results, f, indent=1)

    # B=8 sustained rate with the winner (bench_mesh refresh input)
    xb8 = jnp.concatenate([xb4, xb4])
    f8 = cached_compile(
        lambda a: musica.batch_checksum(a, cfg, interleave=best_g),
        key_parts=("bench_b8", best_g, cfg), example_args=(xb8,),
        verbose=True)
    chk = int(np.asarray(f8(xb8)))
    assert chk == (2 * sum(ref)) % (1 << 32), (chk, sum(ref))
    ms8 = marginal_ms(f8, (xb8,), k=5) / 8
    results["b8_best_g_ms_per_img"] = ms8
    results["best_g"] = best_g
    print(f"B=8 g={best_g}    {ms8:7.3f} ms/img  "
          f"({SIZE * SIZE / ms8 / 1e6:.2f} GPix/s)", flush=True)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"-> {OUT}\nwinner: g={best_g} ({best_ms:.3f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
