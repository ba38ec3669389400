"""Gaussian/Laplacian pyramid ops: 5x5 Burt-Adelson smoothing (a = 0.3),
decimation, zero-stuff upsampling.

TPU design notes
----------------
The reference runs four Vulkan dispatches per level (smooth, downsample,
upsample, smooth x4; ``src/vk_processing.cpp:2232-2273``).  Here each is a
pure function of static shape; XLA fuses the 5-tap separable convolutions
into single VPU passes, and ``smooth_downsample`` computes only the kept
(even) output pixels -- the reference's full-resolution smooth image is never
consumed anywhere else (its only reader is the decimator), so fusing is
exact.

Boundary handling matches the GLSL ``mirror()`` (shaders/img_smooth.comp:10-16):
single reflection without edge repeat (``jnp.pad mode='reflect'``); for axes
of size <= 2 the reflected index can remain out of bounds, in which case the
Vulkan ``imageLoad`` returns 0 -- reproduced via masked gather.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def smooth_weights(dtype=jnp.float32):
    a = 0.3
    w = np.array([0.25 - a / 2, 0.25, a, 0.25, 0.25 - a / 2], dtype=np.float32)
    return w.astype(dtype)


def _mirror_idx(n: int):
    """Static tap indices/validity for positions -2..n+1 (GLSL mirror())."""
    idx = np.empty(n + 4, dtype=np.int32)
    valid = np.empty(n + 4, dtype=np.float32)
    for k in range(-2, n + 2):
        v = k
        if v > n - 1:
            v = (n - 1) - (v - (n - 1))
        elif v < 0:
            v = -v
        ok = 0 <= v <= n - 1
        idx[k + 2] = v if ok else 0
        valid[k + 2] = 1.0 if ok else 0.0
    return idx, valid


def mirror_pad(img: jnp.ndarray) -> jnp.ndarray:
    """Pad both spatial axes by 2 with mirror boundary (OOB -> 0)."""
    h, w = img.shape[-2], img.shape[-1]
    if h >= 3 and w >= 3:
        pad = [(0, 0)] * (img.ndim - 2) + [(2, 2), (2, 2)]
        return jnp.pad(img, pad, mode="reflect")
    out = img
    for axis, n in ((-2, h), (-1, w)):
        idx, valid = _mirror_idx(n)
        out = jnp.take(out, jnp.asarray(idx), axis=axis)
        shape = [1] * out.ndim
        shape[axis] = n + 4
        out = out * jnp.asarray(valid).reshape(shape)
    return out


def smooth(img: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
    """Separable 5x5 smooth, mirror boundary (shaders/img_smooth.comp:17-45).

    gain=4.0 reproduces img_smooth_upsampled (the zero-stuffing energy
    compensation, shaders/img_smooth_upsampled.comp:44).
    """
    h, w = img.shape[-2], img.shape[-1]
    wts = smooth_weights(img.dtype)
    p = mirror_pad(img)
    tmp = sum(wts[m] * p[..., m:m + h, :] for m in range(5))
    out = sum(wts[n] * tmp[..., :, n:n + w] for n in range(5))
    if gain != 1.0:
        out = out * jnp.asarray(gain, img.dtype)
    return out


def downsample(img: jnp.ndarray) -> jnp.ndarray:
    """out[x, y] = in[2x, 2y] (shaders/img_downsample.comp:15)."""
    return img[..., ::2, ::2]


def smooth_downsample(img: jnp.ndarray) -> jnp.ndarray:
    """Fused smooth -> decimate: computes the 5x5 smooth only at even
    coordinates.  Bit-identical to ``downsample(smooth(img))`` because the
    intermediate smooth image has no other consumer in the pipeline."""
    h, w = img.shape[-2], img.shape[-1]
    dh, dw = -(-h // 2), -(-w // 2)
    wts = smooth_weights(img.dtype)
    p = mirror_pad(img)
    # rows at 2i + m  ->  strided slice p[m::2][:dh]
    tmp = sum(wts[m] * p[..., m:m + 2 * dh - 1:2, :] for m in range(5))
    out = sum(wts[n] * tmp[..., :, n:n + 2 * dw - 1:2] for n in range(5))
    return out


def upsample(img: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Zero-stuff x2: out[2x, 2y] = in[x, y] (shaders/img_upsample.comp:18).

    Implemented as stack + reshape interleaving: a strided scatter
    (``.at[::2, ::2].set``) costs ~11.6 ms at 3072^2 on v5e, the reshape
    form ~0.1 ms.
    """
    src = -(-out_size // 2)
    a = img[..., :src, :src]
    z = jnp.zeros_like(a)
    cols = jnp.stack([a, z], axis=-1)
    cols = cols.reshape(cols.shape[:-3] + (src, 2 * src))[..., :, :out_size]
    zr = jnp.zeros_like(cols)
    rows = jnp.stack([cols, zr], axis=-2)
    rows = rows.reshape(rows.shape[:-3] + (2 * src, out_size))
    return rows[..., :out_size, :]


def upsample_smooth(img: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Zero-stuff then smooth with x4 gain = the pyramid 'lowpass'/expand step
    (shaders/img_upsample.comp + img_smooth_upsampled.comp)."""
    return smooth(upsample(img, out_size), gain=4.0)
