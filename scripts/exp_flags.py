"""XLA compiler-option sweep on the full 3072 pipeline.

Every op in the fused program is individually near its VPU/MXU floor
(scripts/exp_ops.py, exp_ablate.py), but in-context costs exceed standalone
sums by ~0.5 ms — scheduling/pipelining overhead.  The remaining cheap lever
is the compiler itself: scoped-VMEM budget (controls how deeply XLA
double-buffers fusions; the HLO shows S(1) scoped allocations) and the
latency-hiding scheduler.  Options are passed per-compile via
``.lower(x).compile(compiler_options=...)`` so one process can A/B them;
unknown options are reported and skipped.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402

import time  # noqa: E402

SIZE = 3072
cfg = MusicaConfig(image_size=SIZE)

CONFIGS = {
    "base": {},
    "vmem4": {"xla_tpu_scoped_vmem_limit_kib": "4096"},
    "vmem8": {"xla_tpu_scoped_vmem_limit_kib": "8192"},
    "vmem12": {"xla_tpu_scoped_vmem_limit_kib": "12288"},
    "vmem24": {"xla_tpu_scoped_vmem_limit_kib": "24576"},
    "exp_cost": {"xla_tpu_enable_experimental_fusion_cost_model": "true"},
    "bundle_cost": {"xla_tpu_use_bundle_aware_cost_model": "true"},
    "sched_mem50": {"xla_tpu_scheduler_percent_shared_memory_limit": "50"},
    "sched_mem90": {"xla_tpu_scheduler_percent_shared_memory_limit": "90"},
}


def compiled_marginal_ms(compiled, args, k=24, reps=6):
    """marginal_ms (profile_phases.py) for an already-compiled executable:
    the output is already a scalar checksum, so no jit re-wrap is needed."""
    np.asarray(compiled(*args))  # warm + fence

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = compiled(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    print("device:", jax.devices()[0])
    img = jnp.asarray(synthetic_radiograph(SIZE, "thorax"))

    def fwd(a):
        return musica.musica_forward(a, cfg)["out_u8"].astype(jnp.uint32).sum()

    lowered = jax.jit(fwd).lower(img)
    ref = None
    for name, opts in CONFIGS.items():
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 - report & continue the sweep
            print(f"{name:14s} COMPILE FAILED: {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            continue
        out = np.asarray(compiled(img))
        ms = compiled_marginal_ms(compiled, (img,))
        if ref is None:
            ref = out
        print(f"{name:14s} {ms:7.3f} ms   checksum_equal="
              f"{bool(np.all(out == ref))}", flush=True)


if __name__ == "__main__":
    main()
