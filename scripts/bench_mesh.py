"""Mesh-scaling benchmark: data-parallel and spatial sharding costs.

Measures ``parallel.sharding.throughput_step`` across (data, space) mesh
shapes and compares per-image cost against the single-device program, in
DEVICE-SECONDS per image (wall time x mesh devices / images per step) so the
comparison is meaningful both on a real multi-chip slice and on the 8-virtual-
device CPU mesh, where all devices share one host's cores and aggregate
compute is constant across mesh shapes.

  python scripts/bench_mesh.py                 # current backend, 8-dev mesh
  python scripts/bench_mesh.py --size 512 --iters 3
  python scripts/bench_mesh.py --configs 8x1,2x4,1x8

On the real single TPU chip (axon), only the degenerate 1x1 mesh runs and the
script reports shard_map dispatch overhead vs process_batch_jit.

Writes artifacts/bench_mesh_<backend>.json.
"""

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fence(x):
    # the axon relay's block_until_ready is unreliable; a host transfer of a
    # scalar forces completion (memory: axon-background-task-hygiene)
    return np.asarray(x)


def time_step(fn, batch, iters, chain=4):
    """Best-of-``iters`` of ``chain`` async dispatches fenced once: the
    dispatches serialize on the device stream, amortizing the fixed ~30 ms
    axon relay round trip that would otherwise dominate small steps."""
    fence(fn(batch))  # compile + warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        r = None
        for _ in range(chain):
            r = fn(batch)
        fence(r)
        best = min(best, (time.perf_counter() - t0) / chain)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batch-per-device", type=int, default=1)
    ap.add_argument("--configs", default=None,
                    help="comma-separated DxS mesh shapes (default: all "
                         "factorizations of the device count)")
    ap.add_argument("--ab-vmap", action="store_true",
                    help="also measure the old vmap-based space>1 "
                         "formulation for the A/B record")
    ap.add_argument("--platform", default=None,
                    help="force a JAX platform (the axon sitecustomize "
                         "overrides JAX_PLATFORMS env, so use this flag)")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.parallel import sharding

    backend = jax.default_backend()
    n_dev = len(jax.devices())
    cfg = MusicaConfig(image_size=args.size)
    print(f"backend={backend} devices={n_dev} size={args.size}")

    if args.configs:
        configs = [tuple(int(v) for v in c.split("x"))
                   for c in args.configs.split(",")]
    else:
        configs = [(d, n_dev // d) for d in range(1, n_dev + 1)
                   if n_dev % d == 0]

    results = {"backend": backend, "n_devices": n_dev, "size": args.size,
               "batch_per_device": args.batch_per_device, "configs": []}

    # single-device reference: the optimal unsharded program (lax.map batch)
    rng = np.random.default_rng(0)
    b_ref = max(1, args.batch_per_device)
    ref_imgs = jnp.asarray(rng.integers(
        0, 65535, (b_ref, args.size, args.size), dtype=np.uint16))
    @jax.jit
    def ref_step(b):
        # scalar checksum: forces full execution without shipping the
        # [B, n-2m, n-2m] u8 output over the (relay) host link
        return musica.process_batch_jit(b, cfg).astype(jnp.uint32).sum()

    dt = time_step(ref_step, ref_imgs, args.iters)
    ref_dev_s = dt / b_ref  # 1 device
    print(f"single-device process_batch_jit: {dt * 1e3:.1f} ms / {b_ref} img "
          f"= {ref_dev_s * 1e3:.1f} device-ms/img")
    results["single_device_ms_per_img"] = ref_dev_s * 1e3

    def vmap_step(mesh, d, s):
        """The pre-r3 space>1 formulation (vmap over the sharded batch) for
        the A/B record: its batched strided-slice layouts are the 2-4x
        per-image penalty the shard_map+lax.map hybrid removes."""
        from functools import partial
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        in_spec = NamedSharding(mesh, P("data", "space", None))

        @partial(jax.jit, in_shardings=(in_spec,),
                 out_shardings=NamedSharding(mesh, P()))
        def step(b):
            out = jax.vmap(lambda im: musica.musica_forward(
                im, cfg, "fact")["out_u8"])(b)
            return out.astype(jnp.uint32).sum()

        rng = np.random.default_rng(0)
        ex = rng.integers(0, 65535,
                          (args.batch_per_device * d, args.size, args.size),
                          dtype=np.uint16)
        return step, jax.device_put(jnp.asarray(ex), in_spec)

    for d, s in configs:
        if d * s > n_dev:
            print(f"skip {d}x{s}: needs {d * s} devices")
            continue
        mesh = sharding.make_mesh(n_data=d, n_space=s)
        step, batch = sharding.throughput_step(
            cfg, mesh, batch_per_device=args.batch_per_device)
        n_img = args.batch_per_device * d
        dt = time_step(step, batch, args.iters)
        dev_s_per_img = dt * (d * s) / n_img
        ratio = dev_s_per_img / ref_dev_s
        entry = {"data": d, "space": s, "step_ms": dt * 1e3, "images": n_img,
                 "device_ms_per_img": dev_s_per_img * 1e3,
                 "vs_single_device": ratio}
        print(f"mesh {d}x{s} (data x space): {dt * 1e3:.1f} ms / {n_img} img "
              f"= {dev_s_per_img * 1e3:.1f} device-ms/img "
              f"({ratio:.2f}x single-device)")
        if args.ab_vmap and s > 1:
            vstep, vbatch = vmap_step(mesh, d, s)
            vdt = time_step(vstep, vbatch, args.iters)
            v_dev_s = vdt * (d * s) / n_img
            entry["vmap_device_ms_per_img"] = v_dev_s * 1e3
            entry["hybrid_vs_vmap"] = dev_s_per_img / v_dev_s
            print(f"  old vmap formulation: {vdt * 1e3:.1f} ms "
                  f"= {v_dev_s * 1e3:.1f} device-ms/img "
                  f"(hybrid is {v_dev_s / dev_s_per_img:.2f}x faster)")
        results["configs"].append(entry)

    # primary criterion: per-image cost of each mesh shape relative to the
    # pure-dp shape on the SAME device pool (immune to the virtual CPU
    # devices sharing one host threadpool)
    dp = next((c for c in results["configs"] if c["space"] == 1), None)
    if dp:
        for c in results["configs"]:
            c["vs_dp"] = c["device_ms_per_img"] / dp["device_ms_per_img"]
            if c["space"] > 1:
                print(f"mesh {c['data']}x{c['space']} vs dp per-image cost: "
                      f"{c['vs_dp']:.2f}x")

    out = Path(args.out or
               Path(__file__).resolve().parents[1] / "artifacts" /
               f"bench_mesh_{backend}.json")
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=1))
    print(f"-> {out}")


if __name__ == "__main__":
    main()
