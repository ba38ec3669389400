"""Pipeline-level A/B: per-level contrast applies vs the rank-3 batched
tile program (models/musica.py::_contrast_apply_rank3).

Trace-guided rationale (docs/PERFORMANCE.md): the leave-one-out ablation
puts the four apply mega-fusions at 1.40 ms IN CONTEXT vs 0.33 ms
standalone -- the largest single bubble in the fused program.  One [85,
384, 384] select-chain program replaces four differently-shaped fusions;
if the gap is inter-fusion scheduling, the batched program should claim
part of it.  Outputs are bit-identical (tests/test_pipeline.py::
test_contrast_apply_rank3_bit_identical), so this is purely a schedule
experiment; A/B at the FULL pipeline level per the round-3 lesson (Pallas/
layout effects only show in context).

    timeout 1800 python -u scripts/exp_apply_rank3.py
    MUSICA_EXP_SIZE=512 MUSICA_AOT_CACHE= python -u scripts/exp_apply_rank3.py
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
                   "artifacts", "exp_apply_rank3.json")


from _timing import marginal_ms  # noqa: E402


def main():
    print(f"device: {jax.devices()[0]}  size: {SIZE}", flush=True)
    x = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
    results = {"device": str(jax.devices()[0]), "size": SIZE}

    def make(method):
        return cached_compile(
            lambda a, m=method: (musica.musica_forward(a, cfg,
                                                       apply_method=m)
                                 ["out_u8"].astype(jnp.uint32).sum()),
            key_parts=("exp_apply", method, cfg), example_args=(x,),
            verbose=True)

    f_per = make("per_level")
    f_r3 = make("rank3")
    c1, c2 = int(np.asarray(f_per(x))), int(np.asarray(f_r3(x)))
    assert c1 == c2, (c1, c2)

    # interleave the two measurements to cancel relay session drift
    for rep in range(2):
        results[f"per_level_ms_{rep}"] = marginal_ms(f_per, (x,))
        results[f"rank3_ms_{rep}"] = marginal_ms(f_r3, (x,))
        print({k: round(v, 3) for k, v in results.items()
               if k.endswith(f"_{rep}")}, flush=True)
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)
    per = min(results["per_level_ms_0"], results["per_level_ms_1"])
    r3 = min(results["rank3_ms_0"], results["rank3_ms_1"])
    results["winner"] = "rank3" if r3 < per else "per_level"
    results["delta_ms"] = per - r3
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)
    print(f"per_level {per:.3f} ms  rank3 {r3:.3f} ms  "
          f"-> {results['winner']} (delta {per - r3:+.3f} ms)", flush=True)


if __name__ == "__main__":
    main()
