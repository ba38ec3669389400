"""Statistical post-analysis tools.

* ``slope_analysis`` -- port of ``test/reg_vs_dir_delta/script.py:11-46``:
  per metric column, per alteration family (groups of 5 intensity steps),
  linear-regression slope over the metric deltas; criterion |slope| > 0.01.
* ``mean_cnr_dir`` -- port of ``test/mean_cnr/script.py``: mean pixel of CNR
  debug BMPs scaled to CNR units (x256 / 2^8).
"""

from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

SLOPE_CRITERION = 0.01
GROUP = 5  # intensity steps per alteration family


def _linregress_slope(y: np.ndarray) -> float:
    t = np.arange(len(y), dtype=np.float64)
    t_mean = t.mean()
    y = np.asarray(y, np.float64)
    denom = np.sum((t - t_mean) ** 2)
    return float(np.sum((t - t_mean) * (y - y.mean())) / denom)


def slope_analysis(rows: List[List[str]], delimiter_hint: str = ";"
                   ) -> List[Tuple[str, str, float, bool]]:
    """rows[0] is the header; column 0 names the alteration.  Returns
    (metric, last-alteration-of-group, slope, |slope| > 0.01) per group of 5."""
    out = []
    header = rows[0]
    for c in range(1, len(header)):
        data = []
        i = 0
        for r in range(1, len(rows)):
            data.append(float(rows[r][c]))
            i += 1
            if i % GROUP == 0:
                slope = _linregress_slope(np.array(data))
                out.append((header[c], rows[i][0], slope,
                            abs(slope) > SLOPE_CRITERION))
                data = []
    return out


def slope_analysis_file(csv_path: str, out_file: Optional[str] = None,
                        delimiter: Optional[str] = None) -> List[str]:
    with open(csv_path, newline="", encoding="utf-8-sig") as f:
        head = f.read(4096)
        f.seek(0)
        delim = delimiter or (";" if head.count(";") > head.count(",") else ",")
        rows = [line for line in csv.reader(f, delimiter=delim)]
    lines = []
    results = slope_analysis(rows)
    for metric, alteration, slope, flag in results:
        lines.append(f"{metric} \t {alteration} \t slope={slope} \t slope test={flag}")
    if out_file:
        Path(out_file).write_text("\n".join(
            f"{m} \t {a} \t {s}" for m, a, s, _ in results) + "\n")
    return lines


_DELTA_HEADER = [
    "Alteration",
    "delta altered vs original mse", "delta altered vs original ssim",
    "delta altered vs original histogram distance",
    "delta altered vs reference mse", "delta altered vs reference ssim",
    "delta altered vs reference histogram distance",
    "delta normalized altered vs reference mse",
    "delta normalized altered vs reference ssim",
    "delta normalized altered vs reference histogram distance",
]


def build_delta_table(robustness_rows: List[List]) -> List[List]:
    """Campaign robustness CSV -> the delta table consumed by the slope
    analysis (the committed ``test/reg_vs_dir_delta/results.csv`` format:
    one row per alteration, 9 delta metrics averaged over anatomies).

    Delta convention (inferred from the committed table): deviation from the
    unaltered case's value -- 1 - value for the similarity metrics and the
    normalized ratios, -value for the histogram distances (whose unaltered
    baseline is 0), matching the sign pattern of results.csv.
    """
    from collections import defaultdict
    groups = defaultdict(list)
    order = []
    for row in robustness_rows[1:]:
        alteration = row[1]
        if alteration not in groups:
            order.append(alteration)
        groups[alteration].append([float(v) for v in row[2:11]])
    baselines = [1, 1, 0, 1, 1, 0, 1, 1, 0]
    out = [_DELTA_HEADER]
    for alteration in order:
        mean = np.mean(np.array(groups[alteration]), axis=0)
        deltas = [b - v for b, v in zip(baselines, mean)]
        out.append([alteration, *deltas])
    return out


def mean_cnr_dir(in_dir: str, out_file: Optional[str] = None,
                 max_cnr: float = 256.0, margin: int = 0):
    """Mean CNR per BMP in a directory (test/mean_cnr/script.py)."""
    from ..utils.io import load_bmp
    results = []
    for name in sorted(os.listdir(in_dir)):
        p = Path(in_dir) / name
        if not p.is_file():
            continue
        img = load_bmp(p).astype(np.float64)
        if margin:
            img = img[margin:img.shape[0] - margin, margin:img.shape[1] - margin]
        mean = (img.mean() / 2 ** 8) * max_cnr
        results.append((name, mean))
    if out_file:
        Path(out_file).write_text(
            "".join(f"{n} \t {v}\n" for n, v in results))
    return results
