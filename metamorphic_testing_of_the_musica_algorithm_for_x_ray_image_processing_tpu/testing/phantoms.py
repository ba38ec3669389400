"""Synthetic X-ray phantoms.

The reference repository ships its six anatomy raws (foot/hand/head/knee/
pelvis/thorax) as large binaries that are absent from the snapshot
(``.MISSING_LARGE_BLOBS``).  To keep the metamorphic campaign and parity
tests runnable, this module synthesizes radiograph-like 16-bit images:
smooth anatomical "bone" ellipses over soft-tissue background, an exposure
falloff, collimated dark borders, and Poisson-like quantum noise -- enough
structure that every pipeline stage (noise estimation, contrast curves,
relevance masking, gradation windowing) operates in its intended regime.
"""

from __future__ import annotations

import numpy as np


_ANATOMY_SEEDS = {
    "foot": 11, "hand": 22, "head": 33, "knee": 44, "pelvis": 55, "thorax": 66,
}

ANATOMIES = tuple(_ANATOMY_SEEDS)


def synthetic_radiograph(size: int = 3072, anatomy: str = "thorax",
                         seed: int | None = None,
                         full_well: float = 40000.0) -> np.ndarray:
    """Generate a [size, size] uint16 synthetic radiograph.

    High values = high transmission (air), matching the raws the reference
    processes (vendor DICOM ground truth is inverted before comparison,
    ``test/metamorphic_test/script.py:396-405``).
    """
    if seed is None:
        seed = _ANATOMY_SEEDS.get(anatomy, 7)
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float64) / size

    # attenuation map (line integral of density)
    atten = np.zeros((size, size), dtype=np.float64)

    # soft tissue: one large smooth blob
    cx, cy = rng.uniform(0.35, 0.65, 2)
    rx, ry = rng.uniform(0.25, 0.42, 2)
    d2 = ((x - cx) / rx) ** 2 + ((y - cy) / ry) ** 2
    atten += 1.2 * np.clip(1.0 - d2, 0.0, None)

    # bones: several dense ellipses with sharper edges
    n_bones = rng.integers(4, 9)
    for _ in range(n_bones):
        bx, by = rng.uniform(0.2, 0.8, 2)
        brx = rng.uniform(0.02, 0.12)
        bry = rng.uniform(0.02, 0.12)
        ang = rng.uniform(0, np.pi)
        xr = (x - bx) * np.cos(ang) + (y - by) * np.sin(ang)
        yr = -(x - bx) * np.sin(ang) + (y - by) * np.cos(ang)
        bd2 = (xr / brx) ** 2 + (yr / bry) ** 2
        atten += 1.8 * np.clip(1.0 - bd2, 0.0, None) ** 0.5

    # fine trabecular texture inside dense regions
    tex = rng.normal(0.0, 1.0, (size // 8 + 1, size // 8 + 1))
    tex = np.kron(tex, np.ones((8, 8)))[:size, :size]
    atten += 0.05 * tex * (atten > 0.5)

    # exposure heel-effect falloff
    falloff = 1.0 - 0.15 * ((x - 0.5) ** 2 + (y - 0.5) ** 2)

    # transmitted intensity (Beer-Lambert), collimated border
    intensity = full_well * falloff * np.exp(-atten)
    border = int(0.03 * size)
    mask = np.ones((size, size))
    mask[:border, :] = mask[-border:, :] = 0.02
    mask[:, :border] = mask[:, -border:] = 0.02
    intensity = intensity * mask

    # quantum (Poisson) noise; normal approximation is fine at these counts
    noisy = intensity + rng.normal(0.0, 1.0, (size, size)) * np.sqrt(
        np.clip(intensity, 1.0, None))
    return np.clip(noisy, 0, 65535).astype(np.uint16)
