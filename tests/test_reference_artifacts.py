"""Validation against the reference's only committed real data:

* the 11 CNR fixture BMPs (`/root/reference/test/mean_cnr/in/*.bmp`) run
  through ``mean_cnr_dir`` (port of test/mean_cnr/script.py) with the values
  pinned, and
* the committed 20-row expected-delta table
  (`/root/reference/test/reg_vs_dir_delta/results.csv`) run through
  ``slope_analysis`` (port of test/reg_vs_dir_delta/script.py:11-46), with
  slopes cross-checked against scipy.stats.linregress and the |slope| > 0.01
  criterion flags pinned.

Both scripts' semantics are exercised end to end on the real artifacts, not
synthetic stand-ins.
"""

import csv
import os

import numpy as np
import pytest

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.analysis import (
    SLOPE_CRITERION, mean_cnr_dir, slope_analysis, slope_analysis_file,
    wilcoxon_analysis, wilcoxon_signed_rank)

REF = "/root/reference/test"
needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not mounted")

# Pinned outputs of test/mean_cnr/script.py over the committed fixtures:
# mean(uint8 BMP as PIL convert("L")) / 2^8 * MAX_CNR_VALUE(256).  CNR decays
# monotonically with both gaussian (gn_sigma) and quantum (qn_dose) noise.
MEAN_CNR_EXPECTED = {
    "gn_1024.0.bmp": 1.8684556749131944,
    "gn_16.0.bmp": 19.26355658637153,
    "gn_256.0.bmp": 6.535929361979167,
    "gn_4.0.bmp": 19.31192355685764,
    "gn_64.0.bmp": 15.34844970703125,
    "qn_0.00625.bmp": 4.849012586805555,
    "qn_0.0125.bmp": 6.691562228732639,
    "qn_0.025.bmp": 8.653632269965279,
    "qn_0.05.bmp": 10.185234917534721,
    "qn_0.1.bmp": 13.096354166666666,
    "unaltered.bmp": 19.339864095052082,
}


@needs_reference
def test_mean_cnr_on_committed_fixtures(tmp_path):
    out_file = tmp_path / "out.txt"
    results = dict(mean_cnr_dir(f"{REF}/mean_cnr/in", str(out_file)))
    assert set(results) == set(MEAN_CNR_EXPECTED)
    for name, expected in MEAN_CNR_EXPECTED.items():
        assert results[name] == pytest.approx(expected, abs=1e-12), name
    # out.txt format: "<name> \t <value>\n" per file (test/mean_cnr/script.py)
    lines = out_file.read_text().splitlines()
    assert len(lines) == 11
    assert lines[-1].startswith("unaltered.bmp \t 19.339864")


@needs_reference
def test_mean_cnr_monotone_in_noise():
    """CNR must decay as injected noise grows -- the physical property the
    reference's mean-CNR check guards."""
    results = dict(mean_cnr_dir(f"{REF}/mean_cnr/in"))
    gn = [results[f"gn_{s}.bmp"] for s in ("4.0", "16.0", "64.0", "256.0",
                                           "1024.0")]
    assert all(a > b for a, b in zip(gn, gn[1:]))
    # quantum noise: LOWER dose factor = more noise = lower CNR
    qn = [results[f"qn_{d}.bmp"] for d in ("0.1", "0.05", "0.025", "0.0125",
                                           "0.00625")]
    assert all(a > b for a, b in zip(qn, qn[1:]))
    assert results["unaltered.bmp"] > max(gn[-1], qn[-1])


def _load_results_csv():
    with open(f"{REF}/reg_vs_dir_delta/results.csv", newline="",
              encoding="utf-8-sig") as f:
        return [line for line in csv.reader(f, delimiter=";")]


@needs_reference
def test_slope_analysis_matches_scipy_on_committed_table():
    scipy_stats = pytest.importorskip("scipy.stats")
    rows = _load_results_csv()
    res = slope_analysis(rows)
    # 20 alterations x 9 metrics -> 4 groups of 5 per metric column
    assert len(res) == 36
    k = 0
    for c in range(1, len(rows[0])):
        data = []
        for r in range(1, len(rows)):
            data.append(float(rows[r][c]))
            if len(data) == 5:
                expected = scipy_stats.linregress(np.arange(5), data).slope
                metric, alteration, slope, flag = res[k]
                assert metric == rows[0][c]
                assert slope == pytest.approx(expected, abs=1e-12)
                assert flag == (abs(expected) > SLOPE_CRITERION)
                k += 1
                data = []
    assert k == 36


@needs_reference
def test_slope_analysis_pinned_values():
    """Pin representative slopes/flags of the committed delta table so a
    regression in the CSV parsing or the regression math is caught exactly."""
    res = {(m, a): (s, f) for m, a, s, f in slope_analysis(_load_results_csv())}
    s, f = res[("delta altered vs original mse", "c_sh_1000")]
    assert s == pytest.approx(-0.05612484379105289, abs=1e-12) and f
    s, f = res[("delta altered vs original ssim", "t_x_1500")]
    assert s == pytest.approx(-0.0031679542794484953, abs=1e-12) and not f
    s, f = res[("delta altered vs original mse", "r_45")]
    assert s == pytest.approx(0.023255253755665402, abs=1e-12) and f
    # overall criterion tally on the committed data
    flags = sum(1 for _, flag in res.values() if flag)
    assert flags == 20


@needs_reference
def test_wilcoxon_matches_scipy_on_committed_table():
    """The ported commented-out branch (test/reg_vs_dir_delta/script.py:30-33):
    wilcoxon(data - mean(data)) per group of 5 -- our self-contained
    implementation must agree with scipy.stats.wilcoxon on every group of the
    committed delta table."""
    scipy_stats = pytest.importorskip("scipy.stats")
    rows = _load_results_csv()
    res = wilcoxon_analysis(rows)
    assert len(res) == 36
    k = 0
    for c in range(1, len(rows[0])):
        data = []
        for r in range(1, len(rows)):
            data.append(float(rows[r][c]))
            if len(data) == 5:
                d = np.asarray(data) - np.mean(data)
                expected = scipy_stats.wilcoxon(d)
                metric, alteration, stat, p = res[k]
                assert metric == rows[0][c]
                assert stat == pytest.approx(expected.statistic, abs=1e-12)
                assert p == pytest.approx(expected.pvalue, rel=1e-10)
                k += 1
                data = []
    assert k == 36


def test_wilcoxon_signed_rank_matches_scipy_cases():
    """Exact path, tie path, and zero path all agree with scipy."""
    scipy_stats = pytest.importorskip("scipy.stats")
    cases = [
        np.array([0.3, -1.2, 2.5, -0.7, 1.9]),          # exact, no ties
        np.array([1.0, -1.0, 2.0, -2.0, 3.0]),          # |d| ties -> approx
        np.array([0.0, -1.5, 2.5, -0.5, 1.0]),          # zero -> approx
        np.array([0.11, -0.23, 0.37, -0.41, 0.53, -0.61, 0.7, -0.83]),
    ]
    for d in cases:
        stat, p = wilcoxon_signed_rank(d)
        exp = scipy_stats.wilcoxon(d)
        assert stat == pytest.approx(exp.statistic, abs=1e-12), d
        assert p == pytest.approx(exp.pvalue, rel=1e-10), d


def test_slope_analysis_file_wilcoxon_lines(tmp_path):
    p = tmp_path / "results.csv"
    p.write_text("Alteration;delta mse\n" +
                 "".join(f"x_{i};{i * 0.05 + (0.013 * (i % 2))}\n"
                         for i in range(5)))
    lines = slope_analysis_file(str(p), wilcoxon=True)
    assert len(lines) == 1
    assert "Test Statistic: " in lines[0] and "p-value: " in lines[0]


def test_cli_slope_analysis_wilcoxon(tmp_path, capsys):
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu import cli
    p = tmp_path / "results.csv"
    p.write_text("Alteration;delta mse\n" +
                 "".join(f"x_{i};{i * 0.07 + 0.011 * (i % 3)}\n"
                         for i in range(5)))
    rc = cli.main(["slope-analysis", str(p), "--wilcoxon"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Test Statistic: " in out and "p-value: " in out


@needs_reference
def test_slope_analysis_file_roundtrip(tmp_path):
    out = tmp_path / "out.txt"
    lines = slope_analysis_file(f"{REF}/reg_vs_dir_delta/results.csv",
                                str(out))
    assert len(lines) == 36
    # reference out.txt line shape: "<metric> \t <alteration> \t <slope>"
    written = out.read_text().splitlines()
    assert len(written) == 36
    assert written[0].split(" \t ")[0] == "delta altered vs original mse"
