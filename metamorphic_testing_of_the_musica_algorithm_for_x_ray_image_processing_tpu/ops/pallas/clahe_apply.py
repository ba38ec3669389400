"""Fused CLAHE apply kernel: bilinear-blended per-tile LUT evaluation
(shaders/clahe_grad_curve_apply.comp:38-160) without HBM gathers.

The XLA formulation in ``ops/clahe.py::clahe_apply`` needs 12 full-image
gathers into the flattened LUT table -- ~837 ms at 3072 on v5e (gathers
are the slowest primitive on TPU).  This kernel replaces every gather
with a one-hot MXU matmul against ALL t*t tile LUTs at once:

* the per-pixel lookup ``lut[i], lut[i+1]`` becomes
  ``LUTMAT [t*t*8, bins] @ onehot [bins, S]``.  The f32 LUTs are pre-split
  into three bf16 planes (8+8+8 mantissa bits); a one-hot column selects
  exactly one product per output row, so the f32 accumulators carry the
  planes exactly and ``(hi + lo) + lo2`` reconstructs the ORIGINAL f32
  bit pattern (the lo2 residual is < ulp/2, so the final rounding lands
  on the exact value).  A shifted-by-one copy of each LUT provides
  ``lut[i+1]`` from the same one-hot.  Verified bit-exact on v5e.
* tile selection never indexes memory: the evaluated values for all
  (tile_x, tile_y) pairs are STATIC rows of the matmul result, combined
  with short where-chains -- scalar conditions along x (read per row from
  a precomputed attribute block) and per-lane conditions along y.
* the tile-coordinate/blend-weight math (``coord / tile_size`` etc.) is
  NOT recomputed in-kernel: Mosaic lowers f32 division as an approximate
  reciprocal (rel ~1e-4 observed), which shifted every weight.  Instead
  the six per-axis attributes (base tile, neighbor tile, two weights,
  center flag, sign) are precomputed ONCE in XLA with the exact operation
  order of ops/clahe.py::clahe_apply and passed in as arrays.  The only
  remaining in-kernel float math -- ``x*bins`` and the segment grid
  ``i/bins`` -- is power-of-two scaling, exact in any lowering, so the
  kernel matches the XLA path to the last ulp of each formula.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

I32 = jnp.int32
F32 = jnp.float32
BF16 = jnp.bfloat16


def _split_bf16x3(a: jnp.ndarray):
    """f32 -> three bf16 planes whose exact sum reconstructs a bit-for-bit
    (24 mantissa bits across three 8-bit-mantissa terms).

    The optimization barriers are LOAD-BEARING: inside a jit, XLA's
    excess-precision simplification elides the f32->bf16->f32 round trip
    (treating the downcast as droppable), which silently zeroes the lo
    planes and leaves a plain bf16 LUT (max error 2^-9 -- observed before
    the barriers were added)."""
    hi = jax.lax.optimization_barrier(a.astype(BF16))
    r1 = a - hi.astype(F32)
    lo = jax.lax.optimization_barrier(r1.astype(BF16))
    lo2 = (r1 - lo.astype(F32)).astype(BF16)
    return hi, lo, lo2


def _axis_attrs(n: int, tile_size: int, t: int):
    """Per-index blend attributes, in the exact operation order of
    ops/clahe.py::clahe_apply: (base tile, neighbor tile, base weight,
    neighbor weight, center flag) as f32 vectors [n]."""
    coord = jnp.arange(n, dtype=F32) / F32(tile_size)
    base = jnp.floor(coord) + F32(0.5)
    diff = coord - base
    sgn = jnp.sign(diff).astype(I32)
    base_i = jnp.floor(base).astype(I32)
    nb_i = jnp.clip(base_i + sgn, 0, t - 1)
    base_c = jnp.clip(base_i, 0, t - 1)
    w_base = 1.0 - jnp.abs(base - coord)
    nb_center = (base_c + sgn).astype(F32) + F32(0.5)
    w_nb = 1.0 - jnp.abs(nb_center - coord)
    zero = (diff == 0.0).astype(F32)
    return (base_c.astype(F32), nb_i.astype(F32), w_base, w_nb, zero)


def _kernel(x_ref, lut_ref, yat_ref, xat_ref, o_ref, *, t, bins, R):
    x = x_ref[:]                       # [R, n]
    M = lut_ref[:]                     # [t*t*8, bins] bf16
    n = x.shape[-1]

    # y-axis (lane) attributes, shared by all rows: [8, n]
    by_c = yat_ref[0:1, :]
    ny_i = yat_ref[1:2, :]
    w_by = yat_ref[2:3, :]
    w_ny = yat_ref[3:4, :]
    zy = yat_ref[4:5, :] == 1.0

    iota_c = jax.lax.broadcasted_iota(I32, (bins, 1), 0)

    def sel_lane(cands, idx_vec):
        out = cands[0]
        for b in range(1, t):
            out = jnp.where(idx_vec == F32(b), cands[b], out)
        return out

    for r in range(R):
        xr = x[r:r + 1, :]             # [1, n]
        i = jnp.clip((xr * F32(bins)).astype(I32), 0, bins - 2)
        oh = (i == iota_c).astype(BF16)            # [bins, n]
        prod = jax.lax.dot_general(M, oh, (((1,), (0,)), ((), ())),
                                   preferred_element_type=F32)  # [t*t*8, n]

        x1 = i.astype(F32) / F32(bins)
        is_last = i == bins - 2
        x2 = jnp.where(is_last, F32(1.0), (i + 1).astype(F32) / F32(bins))
        in_range = (xr >= 0.0) & (xr <= 1.0)
        exact_last = xr == 1.0

        # evaluate against every tile's LUT (static rows of prod)
        E = []                                     # E[a][b]: [1, n]
        for a in range(t):
            row = []
            for b in range(t):
                r0 = (a * t + b) * 8
                y1 = (prod[r0 + 0:r0 + 1] + prod[r0 + 1:r0 + 2]) \
                    + prod[r0 + 2:r0 + 3]
                y2 = (prod[r0 + 3:r0 + 4] + prod[r0 + 4:r0 + 5]) \
                    + prod[r0 + 5:r0 + 6]
                m = (y2 - y1) / (x2 - x1)
                v = m * (xr - x1) + y1
                v = jnp.where(exact_last, y2, v)
                row.append(jnp.where(in_range, v, 0.0))
            E.append(row)

        # x-axis (row) attributes from the precomputed block, as [1, 1]
        # broadcast slices (scalar ref[r, c] reads also verified exact on
        # v5e; the sliced form keeps everything in vregs)
        xa = xat_ref[r:r + 1, :]
        bx_c = xa[0:1, 0:1]
        nx_i = xa[0:1, 1:2]
        w_bx = xa[0:1, 2:3]
        w_nx = xa[0:1, 3:4]
        zx = xa[0:1, 4:5] == 1.0

        # scalar-select the base and neighbor x tile rows of E
        E_base = [E[0][b] for b in range(t)]
        E_nbx = [E[0][b] for b in range(t)]
        for a in range(1, t):
            for b in range(t):
                E_base[b] = jnp.where(bx_c == F32(a), E[a][b], E_base[b])
                E_nbx[b] = jnp.where(nx_i == F32(a), E[a][b], E_nbx[b])

        g_bb = sel_lane(E_base, by_c)
        g_bn = sel_lane(E_base, ny_i)
        g_nb = sel_lane(E_nbx, by_c)
        g_nn = sel_lane(E_nbx, ny_i)

        v_x0 = w_by * g_bb + w_ny * g_bn
        v_y0 = w_bx * g_bb + w_nx * g_nb
        v_4 = (w_bx * w_by * g_bb + w_nx * w_by * g_nb
               + w_bx * w_ny * g_bn + w_nx * w_ny * g_nn)
        out = jnp.where(zx & zy, g_bb,
                        jnp.where(zx, v_x0, jnp.where(zy, v_y0, v_4)))
        o_ref[r:r + 1, :] = out


@functools.partial(jax.jit, static_argnames=("t", "bins", "interpret"))
def clahe_apply_fused(recon: jnp.ndarray, py: jnp.ndarray, t: int = 4,
                      bins: int = 256, interpret: bool = False) -> jnp.ndarray:
    """recon [n, n] + per-tile CDF LUTs py [t, t, bins] -> graded image.

    Requires n % t == 0 (callers fall back to the XLA version otherwise).
    """
    n = recon.shape[-1]
    tile_size = n // t
    assert n == t * tile_size
    R = next((r for r in (96, 48, 32, 16, 8) if n % r == 0), None)
    assert R is not None, n

    py = py.astype(F32)
    y2 = jnp.concatenate([py[..., 1:], py[..., -1:]], axis=-1)
    planes = _split_bf16x3(py) + _split_bf16x3(y2)   # 6 x [t, t, bins]
    lutmat = jnp.stack(planes, axis=2)               # [t, t, 6, bins]
    pad = jnp.zeros((t, t, 2, bins), BF16)
    lutmat = jnp.concatenate([lutmat, pad], axis=2).reshape(t * t * 8, bins)

    attrs = _axis_attrs(n, tile_size, t)             # 5 x [n]
    yat = jnp.concatenate(
        [jnp.stack(attrs, axis=0), jnp.zeros((3, n), F32)], axis=0)  # [8, n]
    xat = jnp.concatenate(
        [jnp.stack(attrs, axis=1), jnp.zeros((n, 128 - 5), F32)],
        axis=1)                                      # [n, 128]

    return pl.pallas_call(
        functools.partial(_kernel, t=t, bins=bins, R=R),
        grid=(n // R,),
        in_specs=[
            pl.BlockSpec((R, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t * t * 8, bins), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n), F32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * recon.size * t * t * 8 * bins,
            bytes_accessed=recon.size * 8, transcendentals=0),
    )(recon, lutmat, yat, xat)
