"""Can interleaving two independent images hide the schedule bubbles?

In-context ablation (exp_ablate.py) shows ~0.5 ms of the fused 3072 program
is shared schedule overhead: removing any large stage frees slack the other
stages reuse, so no single-op rewrite can claim it.  If the overhead is
schedule bubbles (dependency stalls), a program with MORE independent work
should hide it: trace the single-image pipeline TWICE over separate inputs
in one jit (NOT vmap, which batches layouts and costs 2-4x on v5e; NOT
lax.map, which serializes the bodies) and let the latency-hiding scheduler
interleave the two dataflows.

Variants measured (marginal cost, per image):
  single     - the production single-image program (baseline)
  pair       - f(a, b) = (out(a), out(b)) traced twice, one executable
  quad       - four-way interleave
  map2/map4  - lax.map batch path for reference

Checksums asserted equal to the single-image program per image.
"""

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

SIZE = int(os.environ.get("MUSICA_EXP_SIZE", "3072"))
cfg = MusicaConfig(image_size=SIZE)


def checksum(im):
    return musica.musica_forward(im, cfg)["out_u8"].astype(jnp.uint32).sum()


def marginal_ms(fn, args, k=24, reps=6):
    np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # warm + fence

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0])
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    print("device:", jax.devices()[0], " size:", SIZE)
    imgs = [jnp.asarray(synthetic_radiograph(SIZE, a))
            for a in ("thorax", "pelvis", "knee", "hand")]

    f1 = jax.jit(checksum)
    ref = [np.asarray(f1(im)) for im in imgs]
    ms1 = marginal_ms(f1, (imgs[0],))
    print(f"single      {ms1:7.3f} ms/img", flush=True)

    f2 = jax.jit(lambda a, b: (checksum(a) + checksum(b)))
    out2 = np.asarray(f2(imgs[0], imgs[1]))
    assert out2 == ref[0] + ref[1], (out2, ref[0] + ref[1])
    ms2 = marginal_ms(f2, (imgs[0], imgs[1]), k=12)
    print(f"pair        {ms2/2:7.3f} ms/img  ({ms2:7.3f} total, "
          f"{ms1*2/ms2:.3f}x)", flush=True)

    f4 = jax.jit(lambda a, b, c, d:
                 checksum(a) + checksum(b) + checksum(c) + checksum(d))
    out4 = np.asarray(f4(*imgs))
    assert out4 == sum(ref), (out4, sum(ref))
    ms4 = marginal_ms(f4, tuple(imgs), k=6)
    print(f"quad        {ms4/4:7.3f} ms/img  ({ms4:7.3f} total, "
          f"{ms1*4/ms4:.3f}x)", flush=True)

    for b in (2, 4):
        xb = jnp.stack(imgs[:b])
        fm = jax.jit(lambda a: jax.lax.map(checksum, a).sum())
        outm = np.asarray(fm(xb))
        assert outm == sum(ref[:b])
        msm = marginal_ms(fm, (xb,), k=12 // (b // 2))
        print(f"lax.map B={b} {msm/b:7.3f} ms/img  ({msm:7.3f} total, "
              f"{ms1*b/msm:.3f}x)", flush=True)

    # production-shaped hybrid: lax.map over PAIRS of the interleaved body
    # (what process_batch_jit would become if interleaving wins)
    xb = jnp.stack(imgs)  # [4, n, n]
    fp = jax.jit(lambda a: jax.lax.map(
        lambda p: checksum(p[0]) + checksum(p[1]),
        a.reshape(2, 2, *a.shape[1:])).sum())
    outp = np.asarray(fp(xb))
    assert outp == sum(ref)
    msp = marginal_ms(fp, (xb,), k=6)
    print(f"map2(pair)  {msp/4:7.3f} ms/img  ({msp:7.3f} total, "
          f"{ms1*4/msp:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
