"""On-chip A/B: Pallas histogram kernels vs XLA 'fact' path in the BATCH
steady state (B=16 g=4).

The round-5 trace of the production batch program (scripts/exp_trace.py
--batch 16) names grad_hist_relevant_fused as the top op at 0.529 ms/img
-- 2.4x its single-image in-context estimate (0.33 ms, exp_ablate.py) and
~17% of its HBM light speed -- with noise_hist_fused L0 second at 0.462.
Hypothesis: Pallas custom-calls serialize against the XLA stream, so in
the g=4 interleaved batch they cannot be overlapped with other images'
fusions the way XLA's own one-hot histogram fusions can; the single-image
win of the fused kernels (3.87 vs 4.23 ms, exp_gradpath.py) may invert at
B=16.

One process, baseline first AND last:

    timeout 3600 python -u scripts/exp_batch_hist.py
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
B, G = 16, musica.DEFAULT_INTERLEAVE
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "artifacts", f"exp_batch_hist_{SIZE}.json"
                   if SIZE != 3072 else "exp_batch_hist.json")


def main():
    dev = jax.devices()[0]
    print(f"device: {dev}  size: {SIZE}  B={B} g={G}", flush=True)
    cfg = MusicaConfig(image_size=SIZE)
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]
    xb = jnp.concatenate([jnp.stack(imgs)] * (B // 4))
    results = {"device": str(dev), "size": SIZE, "batch": B, "interleave": G}

    fns = {}
    for hm in ("auto", "fact"):
        fns[hm] = cached_compile(
            lambda a, hm=hm: musica.batch_checksum(a, cfg, hm, interleave=G),
            key_parts=("bench_b" if hm == "auto" else f"bhist_{hm}",
                       B, G, cfg),
            example_args=(xb,), verbose=True)

    # integer counts are identical by construction; verify the checksum too
    import numpy as np
    c_auto = int(np.asarray(fns["auto"](xb)))
    c_fact = int(np.asarray(fns["fact"](xb)))
    results["checksums_equal"] = (c_auto == c_fact)
    print(f"checksums: auto={c_auto} fact={c_fact} "
          f"equal={results['checksums_equal']}", flush=True)

    order = [("auto", fns["auto"]), ("fact", fns["fact"]),
             ("auto_rerun", fns["auto"])]
    for name, fn in order:
        ms = marginal_ms(fn, (xb,), k=3) / B
        results[name + "_ms_per_img"] = round(ms, 4)
        print(f"{name:12s} {ms:7.3f} ms/img  "
              f"({SIZE * SIZE / ms / 1e6:.2f} GPix/s)", flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    print(f"-> {OUT}", flush=True)


if __name__ == "__main__":
    main()
