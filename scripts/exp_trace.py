"""Trace-based gap analysis of the fused 3072 pipeline.

In-context ablation (exp_ablate.py) shows ~0.5 ms of the program is shared
schedule overhead no single-op rewrite can claim.  This captures a
jax.profiler XPlane trace of K chained invocations and parses it with
jax.profiler.ProfileData (no TensorBoard needed) to show, per device plane:

* total span vs busy time (sum of top-level op durations) -> idle gaps,
* the top ops by total duration -> where a Pallas/fusion rewrite would pay.

Works on any backend; run on the real chip to see the production schedule:

    python scripts/exp_trace.py            # axon TPU (preset)
    MUSICA_TRACE_PLATFORM=cpu python scripts/exp_trace.py --size 512
"""

import argparse
import collections
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("MUSICA_TRACE_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MUSICA_TRACE_PLATFORM"])

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica  # noqa: E402
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.phantoms import synthetic_radiograph  # noqa: E402


def analyze(trace_dir: str, top: int = 25) -> None:
    paths = []
    for root, _, files in os.walk(trace_dir):
        paths.extend(os.path.join(root, f) for f in files
                     if f.endswith(".xplane.pb"))
    if not paths:
        print(f"no xplane.pb under {trace_dir}")
        return
    pd = jax.profiler.ProfileData.from_file(max(paths, key=os.path.getmtime))
    for plane in pd.planes:
        # device planes: '/device:TPU:0 ...' on TPU, '/host:CPU' lines
        # ('tf_XLA...') on the CPU backend; the host 'python' line is the
        # tracing overhead view, not the schedule -- skip it.
        for line in plane.lines:
            if line.name == "python":
                continue
            per_op = collections.Counter()
            count = collections.Counter()
            t_min, t_max, busy = float("inf"), 0.0, 0.0
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
                count[ev.name] += 1
                t_min = min(t_min, ev.start_ns)
                t_max = max(t_max, ev.end_ns)
                busy += ev.duration_ns
            if not per_op:
                continue
            span = t_max - t_min
            print(f"\n=== {plane.name} :: {line.name} "
                  f"({sum(count.values())} events) ===")
            print(f"span {span/1e6:.3f} ms  busy {busy/1e6:.3f} ms  "
                  f"idle {(span-busy)/1e6:.3f} ms "
                  f"({(span-busy)/span*100 if span else 0:.1f}%)")
            print(f"{'op':60s} {'total ms':>9s} {'n':>5s} {'avg us':>8s}")
            for op, ns in per_op.most_common(top):
                print(f"{op[:60]:60s} {ns/1e6:9.3f} {count[op]:5d} "
                      f"{ns/count[op]/1e3:8.1f}")
            # largest gaps between consecutive events on this line: on a
            # flat device stream these are schedule bubbles, and the
            # neighboring op names say which dependency stalls the stream
            evs = sorted(line.events, key=lambda e: e.start_ns)
            gaps = []
            for a, b in zip(evs, evs[1:]):
                g = b.start_ns - a.end_ns
                if g > 0:
                    gaps.append((g, a.name, b.name))
            gaps.sort(reverse=True)
            if gaps:
                print("largest gaps:")
                for g, before, after in gaps[:8]:
                    print(f"  {g/1e3:9.1f} us  after {before[:40]:40s} "
                          f"before {after[:40]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3072)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=0,
                    help="trace the production batch-checksum program at "
                         "this B (g = DEFAULT_INTERLEAVE) instead of the "
                         "single-image program -- the bench.py steady state")
    ap.add_argument("--keep", default=None,
                    help="keep the trace under this directory")
    args = ap.parse_args()

    cfg = MusicaConfig(image_size=args.size)
    img = jnp.asarray(synthetic_radiograph(args.size, "thorax"))
    if args.batch:
        xb = jnp.stack([img] * args.batch)
        f = jax.jit(lambda a: musica.batch_checksum(
            a, cfg, interleave=musica.DEFAULT_INTERLEAVE))
        img = xb
    else:
        f = jax.jit(lambda a: musica.musica_forward(a, cfg)["out_u8"]
                    .astype(jnp.uint32).sum())
    np.asarray(f(img))  # compile + warm outside the trace

    trace_dir = args.keep or tempfile.mkdtemp(prefix="musica_trace_")
    print("device:", jax.devices()[0], " trace:", trace_dir)
    jax.profiler.start_trace(trace_dir)
    s = None
    for _ in range(args.iters):
        s = f(img)
    np.asarray(s)
    jax.profiler.stop_trace()
    analyze(trace_dir, args.top)


if __name__ == "__main__":
    main()
