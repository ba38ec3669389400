"""Piecewise quadratic-bezier curve LUTs and their evaluation.

The reference stores curves as explicit (x, y) point lists in storage buffers
and evaluates them with a first-match linear search per pixel
(``getY``, shaders/contrast_curve_apply.comp:27-36).  Here curve generation is
a handful of scalar jnp ops (the points are functions of traced histogram
statistics), and ``curve_get_y`` is an unrolled compare/select chain over the
statically-sized point list -- XLA fuses it into a single elementwise pass,
so evaluating a 33-point curve over a 3072^2 image is one VPU sweep.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import MusicaConfig

F32 = jnp.float32


def bezier_points(start, middle, end, inclusive: bool):
    """Quadratic bezier sampled at t = i/10 (double-lerp form).

    ``inclusive=True``: 11 points, i <= 10 (contrast_curve_generate.comp:40);
    ``inclusive=False``: 10 points, i < 10 (gradation_curve_generate.comp:31).
    start/middle/end are (x, y) tuples of traced or static f32 scalars.
    Returns (px[k], py[k]) stacked arrays.
    """
    count = 11 if inclusive else 10
    t = jnp.arange(count, dtype=F32) / F32(10.0)
    sx, sy = [jnp.asarray(v, F32) for v in start]
    mx, my = [jnp.asarray(v, F32) for v in middle]
    ex, ey = [jnp.asarray(v, F32) for v in end]
    xa = sx + (mx - sx) * t
    ya = sy + (my - sy) * t
    xb = mx + (ex - mx) * t
    yb = my + (ey - my) * t
    return xa + (xb - xa) * t, ya + (yb - ya) * t


def contrast_curve(max_bin: jnp.ndarray, low_contrast_factor: float,
                   high_contrast_factor: float, cfg: MusicaConfig):
    """Per-level contrast LUT (shaders/contrast_curve_generate.comp:56-90).

    ``low_contrast_factor == 1.0`` (a static Python float per level) selects
    the flat 2-point latitude-reduction line; otherwise 3 bezier segments (33
    points) around maxBinPosition = maxBin / 2048 * 0.1.
    """
    lcf = F32(low_contrast_factor)
    hcf = F32(high_contrast_factor)
    if low_contrast_factor == 1.0:
        px = jnp.array([0.0, 1.0], F32)
        py = jnp.stack([hcf, hcf])
        return px, py
    # stepwise f32 rounding: (maxBin * (1/2048)) * 0.1
    p = (max_bin.astype(F32) * F32(1.0 / cfg.noise_histogram_bins)
         * F32(cfg.max_noise_value))
    one = F32(1.0)
    # left-associated products as the GLSL writes them ((p * 7) / 5.0 etc.);
    # folding the constants changes the f32 rounding by 1 ulp
    p45 = p * F32(4.0) / F32(5.0)
    p65 = p * F32(6.0) / F32(5.0)
    p75 = p * F32(7.0) / F32(5.0)
    l45 = lcf * F32(4.0) / F32(5.0)
    seg1 = bezier_points((F32(0.0), one), (p45, lcf), (p, lcf), True)
    seg2 = bezier_points((p, lcf), (p65, lcf), (p75, l45), True)
    seg3 = bezier_points((p75, l45), (p * F32(2.0), one), (one, one), True)
    px = jnp.concatenate([seg1[0], seg2[0], seg3[0]])
    py = jnp.concatenate([seg1[1], seg2[1], seg3[1]])
    return px, py


def curve_get_y(px: jnp.ndarray, py: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """First-match piecewise-linear lookup, transcribing the GLSL getY exactly
    (shaders/contrast_curve_apply.comp:27-36):

    for i in [0, count): if px[i] == x -> py[i];
                         if px[i] <= x <= px[i+1] -> lerp (px[count] reads 0);
    no match -> 0.0.
    """
    n = px.shape[0]
    px_e = jnp.concatenate([px, jnp.zeros((1,), F32)])
    py_e = jnp.concatenate([py, jnp.zeros((1,), F32)])
    x = x.astype(F32)
    result = jnp.zeros_like(x)
    found = jnp.zeros(x.shape, bool)
    for i in range(n):
        exact = (px_e[i] == x) & ~found
        result = jnp.where(exact, py_e[i], result)
        found = found | exact
        seg = (px_e[i] <= x) & (px_e[i + 1] >= x) & ~found
        m = (py_e[i + 1] - py_e[i]) / (px_e[i + 1] - px_e[i])
        val = m * (x - px_e[i]) + py_e[i]
        result = jnp.where(seg, val, result)
        found = found | seg
    return result


def curve_get_y_sorted(px: jnp.ndarray, py: jnp.ndarray,
                       x: jnp.ndarray) -> jnp.ndarray:
    """curve_get_y for non-decreasing px, as disjoint LEFT-open interval
    selects (no `found` dependency chain, no gathers).

    Equivalence with the first-match scan on sorted px: the scan's exact-x
    branch only ever fires at i == 0 (for any later j, segment j-1's test
    ``px[j-1] <= x <= px[j]`` catches ``x == px[j]`` first and returns the
    LEFT segment's lerp -- note: NOT py[j]); every other x falls in exactly
    one interval (px_i, px_{i+1}] (zero-width duplicate segments never
    match); x outside (px_0, px_last] yields 0.0 except x == px_0 -> py_0
    (the reference's fallthrough/ext-zero read).
    Fewer VPU ops than curve_get_y and no cross-iteration dependency chain.
    (A value-carrying tournament tree was tried and measured SLOWER on v5e
    -- 0.72 -> 2.8 ms for the tone map: XLA materializes the tree's carried
    intermediates instead of fusing them into one elementwise pass; see
    docs/PERFORMANCE.md negative results.)

    Evaluated as a LAST-TRUE-WINS select chain over ``lt[i] = px[i] < x``:
    px non-decreasing makes lt monotone non-increasing in i, so the unique
    matching interval ``lt[i] & ~lt[i+1]`` is simply the LAST i with lt[i]
    true.  Zero-width duplicate intervals at segment joins can never be the
    last true index (lt[j] == lt[j+1] there), matching the
    disjoint-interval formulation; x beyond px[-1] falls to 0.0 via the
    final lt[n-1] select.

    The chain selects the matching interval's SCALARS (slope m, px, py) --
    3 selects + 1 compare per interval -- and evaluates ONE lerp on the
    selected triple, instead of evaluating every interval's lerp and
    selecting values (1 compare + sub/mul/add + select per interval):
    ~130 -> ~110 VPU ops/pixel for the 33-point contrast curve.  The
    selected scalars and the final lerp arithmetic are exactly those the
    per-interval evaluation would use, so the result is bit-identical
    (zero-width intervals produce inf/nan slopes but are never selected,
    exactly as their lerp values were computed and never selected before).
    """
    x = x.astype(F32)
    n = px.shape[0]
    lt = [px[i] < x for i in range(n)]
    ms = (py[1:] - py[:-1]) / (px[1:] - px[:-1])

    m_s, px_s, py_s = ms[0], px[0], py[0]
    for i in range(1, n - 1):
        m_s = jnp.where(lt[i], ms[i], m_s)
        px_s = jnp.where(lt[i], px[i], px_s)
        py_s = jnp.where(lt[i], py[i], py_s)
    result = m_s * (x - px_s) + py_s
    result = jnp.where(lt[0], result,
                       jnp.where(x == px[0], py[0], F32(0.0)))
    return jnp.where(lt[n - 1], F32(0.0), result)


def curve_get_y_adaptive(px: jnp.ndarray, py: jnp.ndarray,
                         x: jnp.ndarray) -> jnp.ndarray:
    """curve_get_y that switches to the cheaper sorted-interval evaluation
    when px is non-decreasing at runtime (lax.cond executes one branch).

    The gradation curve is usually monotone; its second bezier segment can
    overshoot t1 when ts > t1, in which case only the first-match chain is
    faithful.
    """
    import jax
    monotone = jnp.all(px[1:] >= px[:-1])
    return jax.lax.cond(
        monotone,
        lambda args: curve_get_y_sorted(*args),
        lambda args: curve_get_y(*args),
        (px, py, x))


def curve_apply_u8_adaptive(px: jnp.ndarray, py: jnp.ndarray,
                            x: jnp.ndarray) -> jnp.ndarray:
    """``clip(trunc(255 * curve_get_y_adaptive(px, py, x)))`` as uint8, with
    the quantization fused INTO each lax.cond branch.

    Bit-identical to quantizing outside the cond, but XLA then fuses the
    whole tone map + quantize into one elementwise pass per branch instead
    of materializing the full-res f32 graded image across the cond boundary
    (0.81 -> 0.39 ms at 3072^2 on v5e, scripts/profile_phases.py).
    """
    import jax

    def quant(g):
        return jnp.clip(jnp.trunc(F32(255.0) * g), 0.0, 255.0).astype(jnp.uint8)

    monotone = jnp.all(px[1:] >= px[:-1])
    return jax.lax.cond(
        monotone,
        lambda args: quant(curve_get_y_sorted(*args)),
        lambda args: quant(curve_get_y(*args)),
        (px, py, x))


def contrast_curve_apply(bandpass: jnp.ndarray, sdev: jnp.ndarray,
                         px: jnp.ndarray, py: jnp.ndarray) -> jnp.ndarray:
    """out = bandpass * curveY(sdev) (shaders/contrast_curve_apply.comp:38-63).

    The contrast curves' px is provably non-decreasing (bezier controls lie
    between segment endpoints), so the cheaper sorted-interval getY applies.
    """
    return bandpass * curve_get_y_sorted(px, py, sdev)
