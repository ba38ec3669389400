"""Histogram-kernel variant shootout on the real TPU chip.

Variants over (C, F) factorization, dot operand order (swap: M = the
128-sized one-hot), row grouping g (block-diagonal extraction), and one-hot
dtype (bf16 vs int8).  All variants produce bit-identical int32 counts; the
winner graduates into ops/pallas/fused_hist.py.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.ops.pallas.fused_hist import (
    _prefix_or_in_group, noise_hist_fused)

I32 = jnp.int32
F32 = jnp.float32


def _accumulate_v2(bins, w, out_ref, C, F, g, swap, dt):
    """Variant accumulate: groups of g rows, optional operand swap, dtype dt.

    out_ref shape: (C, F) when not swap, (F, C) when swap.
    """
    rows = bins.shape[0]
    assert rows % g == 0
    iota_c = jax.lax.broadcasted_iota(I32, (C, 1), 0)
    iota_f = jax.lax.broadcasted_iota(I32, (F, 1), 0)
    acc = jnp.zeros(out_ref.shape, I32)
    for r0 in range(0, rows, g):
        a_parts, f_parts = [], []
        for j in range(g):
            b_row = bins[r0 + j:r0 + j + 1, :]
            w_row = w[r0 + j:r0 + j + 1, :]
            cb = b_row // F
            fb = b_row % F
            if dt == jnp.int8:
                a_parts.append(jnp.where(cb == iota_c, w_row, 0.0).astype(dt))
            else:
                a_parts.append(jnp.where(cb == iota_c, w_row, 0.0).astype(dt))
            f_parts.append((fb == iota_f).astype(dt))
        a_t = a_parts[0] if g == 1 else jnp.concatenate(a_parts, 0)  # [gC, K]
        f_t = f_parts[0] if g == 1 else jnp.concatenate(f_parts, 0)  # [gF, K]
        pref = I32 if dt == jnp.int8 else F32
        if swap:
            part = jax.lax.dot_general(f_t, a_t, (((1,), (1,)), ((), ())),
                                       preferred_element_type=pref)  # [gF, gC]
            part = part.astype(I32)
            for j in range(g):
                acc = acc + part[j * F:(j + 1) * F, j * C:(j + 1) * C]
        else:
            part = jax.lax.dot_general(a_t, f_t, (((1,), (1,)), ((), ())),
                                       preferred_element_type=pref)  # [gC, gF]
            part = part.astype(I32)
            for j in range(g):
                acc = acc + part[j * C:(j + 1) * C, j * F:(j + 1) * F]
    out_ref[:] += acc


def _noise_kernel_v2(sdev_ref, out_ref, *, C, F, n_bins, tile, max_noise,
                     g, swap, dt):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    v = sdev_ref[:]
    adjusted = v / F32(max_noise)
    bins = (adjusted * F32(n_bins) + F32(0.5)).astype(I32)
    brk = ((v == 0.0) | (adjusted > 1.0) | (bins == 0)).astype(I32)
    dead = _prefix_or_in_group(brk, tile)
    w = ((1 - dead) * (bins < n_bins)).astype(F32)
    bins = jnp.clip(bins, 0, n_bins - 1)
    _accumulate_v2(bins, w, out_ref, C, F, g, swap, dt)


@functools.partial(jax.jit, static_argnames=(
    "n_bins", "C", "F", "g", "swap", "dt", "rows"))
def noise_hist_v2(sdev_cov, n_bins, C, F, g, swap, dt, rows):
    cov = sdev_cov.shape[-1]
    oshape = (F, C) if swap else (C, F)
    h = pl.pallas_call(
        functools.partial(_noise_kernel_v2, C=C, F=F, n_bins=n_bins, tile=16,
                          max_noise=0.1, g=g, swap=swap, dt=dt),
        grid=(sdev_cov.shape[-2] // rows,),
        in_specs=[pl.BlockSpec((rows, cov), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(oshape, lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(oshape, I32),
        cost_estimate=pl.CostEstimate(
            flops=2 * sdev_cov.size * C * F * g,
            bytes_accessed=sdev_cov.size * 4, transcendentals=0),
    )(sdev_cov)
    if swap:
        h = h.T
    return h.reshape(-1)[:n_bins]


def marginal_ms(fn, args, k=24, reps=5):
    g = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    np.asarray(g(*args))

    def run(n):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = None
            for _ in range(n):
                out = g(*args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        return best

    t1, tk = run(1), run(k)
    return max(tk - t1, 0.0) / (k - 1) * 1e3


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 3072
    sdev = jnp.asarray(
        rng.uniform(0.0, 0.12, (n, n)).astype(np.float32))

    ref = np.asarray(noise_hist_fused(sdev, 2048, 16, 0.1, rows=96))
    t0 = marginal_ms(lambda v: noise_hist_fused(v, 2048, 16, 0.1, rows=96),
                     (sdev,))
    print(f"baseline fused (C=16,F=128,g=1,bf16, rows=96): {t0:7.3f} ms")

    cases = [
        # (C, F, g, swap, dt, rows, label)
        (16, 128, 1, True, jnp.bfloat16, 96, "swap M=128"),
        (64, 32, 1, False, jnp.bfloat16, 96, "64x32"),
        (64, 32, 2, False, jnp.bfloat16, 96, "64x32 g2 -> M=128"),
        (32, 64, 1, True, jnp.bfloat16, 96, "32x64 swap M=64"),
        (32, 64, 2, True, jnp.bfloat16, 96, "32x64 g2 swap M=128"),
        (16, 128, 1, True, jnp.int8, 96, "swap int8"),
        (64, 32, 2, False, jnp.int8, 96, "64x32 g2 int8"),
        (16, 128, 1, False, jnp.int8, 96, "noswap int8"),
        (16, 128, 1, True, jnp.bfloat16, 48, "swap rows=48"),
        (16, 128, 1, True, jnp.bfloat16, 192, "swap rows=192"),
    ]
    for C, F, g, swap, dt, rows, label in cases:
        try:
            h = np.asarray(noise_hist_v2(sdev, 2048, C, F, g, swap, dt, rows))
            ok = "OK " if np.array_equal(h, ref) else "MISMATCH"
            t = marginal_ms(
                lambda v: noise_hist_v2(v, 2048, C, F, g, swap, dt, rows),
                (sdev,))
            print(f"{label:28s}: {t:7.3f} ms  {ok}")
        except Exception as e:
            print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()


def widek():
    """K-widening: reshape (3072,3072) -> (3072/r, 3072*r); break groups are
    16-lane-aligned so semantics are preserved."""
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    n = 3072
    sdev = jnp.asarray(rng.uniform(0.0, 0.12, (n, n)).astype(np.float32))
    ref = np.asarray(noise_hist_fused(sdev, 2048, 16, 0.1, rows=96))

    for r, rows, C, F, label in [
        (2, 48, 16, 128, "K=6144 rows=48"),
        (2, 96, 16, 128, "K=6144 rows=96"),
        (4, 24, 16, 128, "K=12288 rows=24"),
        (4, 48, 16, 128, "K=12288 rows=48"),
        (8, 24, 16, 128, "K=24576 rows=24"),
        (4, 24, 64, 32, "K=12288 rows=24 64x32"),
        (8, 12, 64, 32, "K=24576 rows=12 64x32"),
        (16, 12, 64, 32, "K=49152 rows=12 64x32"),
        (8, 24, 64, 32, "K=24576 rows=24 64x32"),
        (8, 48, 64, 32, "K=24576 rows=48 64x32"),
    ]:
        v = sdev.reshape(n // r, n * r)
        try:
            h = np.asarray(noise_hist_v2(v, 2048, C, F, 1, False,
                                         jnp.bfloat16, rows))
            ok = "OK " if np.array_equal(h, ref) else "MISMATCH"
            t = marginal_ms(
                lambda x: noise_hist_v2(x, 2048, C, F, 1, False,
                                        jnp.bfloat16, rows), (v,))
            print(f"{label:28s}: {t:7.3f} ms  {ok}")
        except Exception as e:
            print(f"{label:28s}: FAILED {type(e).__name__}: {str(e)[:100]}")
