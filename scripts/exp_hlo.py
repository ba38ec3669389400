"""Dump the TPU-optimized HLO of the full pipeline for offline inspection.

Writes /tmp/musica_hlo.txt (post-optimization, with fusion boundaries and
layout annotations) so the apply-chain fusions can be examined: how many
fusions contain the getY select chains, whether producers are duplicated
into several fusions, and which layouts the interleave/bandpass tensors
get assigned.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)


def main():
    print("device:", jax.devices()[0])
    img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))
    f = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"])
    compiled = f.lower(img).compile()
    txt = compiled.as_text()
    out = "/tmp/musica_hlo.txt"
    with open(out, "w") as fh:
        fh.write(txt)
    print(f"wrote {out}: {len(txt)} chars")
    # quick stats
    import re
    fusions = re.findall(r"^\s*%?(\S+) = \S+ fusion\(", txt, re.M)
    print("fusion count:", len(fusions))
    for kind in ("divide", "select", "custom-call", "conditional"):
        print(f"{kind:12s}", txt.count(f" {kind}("))


if __name__ == "__main__":
    main()
