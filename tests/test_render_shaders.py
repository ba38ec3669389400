"""Golden tests for the pixel-faithful render-shader transcriptions
(utils/render.py vs shaders/noise_hist_render.comp,
gradation_curve_debug_render.comp, img_histogram_render.comp,
gradation_curve_render.comp, contrast_curve_render.comp)."""

import numpy as np
import pytest

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils import render as R

W, H = R.W, R.H


def test_noise_hist_render_basic():
    hist = np.zeros(2048, np.int64)
    hist[5] = 100          # peak
    hist[7] = 50
    hist[600] = 99999      # beyond column 512: never drawn (factor = 1.0)
    img = R.render_noise_hist(hist, max_value=100, max_bin=5)
    # baseline: red pixel at the bottom of every column (bar stops above it)
    assert np.all(img[H - 1, :] == R.RED)
    # peak column 5: barHeight = uint(100 * 128/101) = 126, green
    bar = int(np.float32(100) * (np.float32(H) / np.float32(101)))
    assert bar == 126
    col = img[:, 5]
    assert np.all(col[H - bar - 1:H - 1] == R.GREEN)
    assert np.all(col[:H - bar - 1] == R.BLACK)
    # column 7: white bar of uint(50 * 128/101) = 63 rows
    bar7 = int(np.float32(50) * (np.float32(H) / np.float32(101)))
    assert np.all(img[H - bar7 - 1:H - 1, 7] == R.WHITE)
    # empty column: all black above the red baseline
    assert np.all(img[:H - 1, 100] == R.BLACK)
    # column 600's huge count is invisible: only bins [0, 512) are sampled
    assert np.all(img[:H - 1, 511] == R.BLACK)


def test_noise_hist_render_barheight_underflow_quirk():
    """barHeight == 128 exactly -> startY wraps under uint arithmetic and the
    bar loop never executes (noise_hist_render.comp:52-56): with
    maxValue = 2^24, float(maxValue + 1) rounds to 2^24 in f32, so
    value = 2^24 gives barHeight = uint(2^24 * 128 / 2^24) = 128."""
    hist = np.zeros(2048, np.int64)
    hist[3] = 1 << 24
    img = R.render_noise_hist(hist, max_value=1 << 24, max_bin=3)
    # column 3 stays black (no bar drawn) except the red baseline
    assert np.all(img[:H - 1, 3] == R.BLACK)
    assert np.all(img[H - 1, 3] == R.RED)


def test_img_histogram_render_factor2_and_background():
    hist = np.zeros(1024, np.int64)
    hist[20] = 10          # sampled by column 10 (binPos = 2x)
    hist[21] = 7           # never sampled (odd bin)
    bg = np.full((H, W, 4), 9, np.uint8)
    img = R.render_img_histogram(hist, max_value=10, max_bin=20,
                                 background=bg)
    bar = int(np.float32(10) * (np.float32(H) / np.float32(11)))
    col = img[:, 10]
    # peak condition: binPos <= maxBin < binPos + 2 -> magenta
    assert np.all(col[H - bar - 1:H - 1] == R.MAGENTA)
    # stale background preserved where nothing is stored (no column clear)
    assert np.all(img[0, 10] == 9)
    assert np.all(img[:H - 1, 11] == 9)
    assert np.all(img[H - 1, :] == R.RED)
    # odd bin 21 is invisible
    assert not np.any((img[:, :, 2] == 255) & (img[:, :, 0] == 255)
                      & (np.arange(W)[None, :] == 10) & False)


def test_img_histogram_render_peak_covers_two_bins():
    """maxBin = 2x + 1 (odd) still paints column x magenta:
    binPos <= maxBin && binPos + 2.0 > maxBin."""
    hist = np.zeros(1024, np.int64)
    hist[40] = 5
    img = R.render_img_histogram(hist, max_value=5, max_bin=41)
    bar = int(np.float32(5) * (np.float32(H) / np.float32(6)))
    assert np.all(img[H - bar - 1:H - 1, 20] == R.MAGENTA)


def test_gradation_curve_debug_render_baseline_overwritten():
    """The red baseline pixel is stored and then repainted black by the
    full-column else branch (gradation_curve_debug_render.comp:77-92)."""
    hist = np.zeros(1024, np.int64)
    hist[0] = 1
    px = np.array([0.0, 1.0], np.float32)
    py = np.array([1.0, 1.0], np.float32)  # getY == 1 -> curve at row 0
    img = R.render_gradation_curve_debug(hist, 1, 0, px, py,
                                         t0=-1.0, ta=-1.0, t1=-1.0)
    # no marker fires (t < 0 can't satisfy curvePos <= t); baseline is black
    # everywhere except where the bar of column 0 sits
    assert np.all(img[H - 1, 1:] == R.BLACK)
    # curve: exact-x match at x=0 -> y=1 -> row 0 blue; for x>0 the segment
    # lerp of the flat curve also gives 1.0
    assert np.all(img[0, :] == R.BLUE)


def test_gradation_curve_debug_render_markers_and_peak():
    hist = np.zeros(1024, np.int64)
    hist[100] = 50         # sampled by column 50
    px = np.array([0.0, 1.0], np.float32)
    py = np.array([0.0, 0.0], np.float32)
    # t = 200.5/512 falls in column 200's [curvePos, curvePos + 1/512) window
    t0 = 200.5 / 512.0
    ta = 300.0 / 512.0     # exactly at column 300's left edge
    img = R.render_gradation_curve_debug(hist, 50, 100, px, py,
                                         t0=t0, ta=ta, t1=-1.0)
    bar = int(np.float32(50) * (np.float32(H) / np.float32(51)))
    assert np.all(img[H - bar - 1:H - 1, 50] == R.MAGENTA)
    # t0 column: red full height -- except the blue curve pixel on top
    assert np.all(img[:H - 1, 200] == R.RED)
    # curve pixel (y=0 curve -> row 127) overwrites the marker at its row
    assert np.all(img[H - 1, 200] == R.BLUE)
    # ta column: green
    assert np.all(img[:H - 1, 300] == R.GREEN)
    assert np.all(img[H - 1, 300] == R.BLUE)


def test_gradation_curve_render_yellow_ta_and_white_curve():
    px = np.array([0.0, 1.0], np.float32)
    py = np.array([0.0, 1.0], np.float32)  # identity ramp
    ta = 128.0 / 512.0
    img = R.render_gradation_curve(px, py, t0=-1.0, ta=ta, t1=-1.0)
    # ta column yellow, except the white curve pixel drawn after
    gy = np.float32(128.0 / 512.0)
    pos_y = (H - 1) - int(gy * np.float32(H - 1))
    col = img[:, 128]
    assert np.all(col[pos_y] == R.WHITE)
    mask = np.ones(H, bool)
    mask[pos_y] = False
    assert np.all(col[mask] == R.YELLOW)
    # elsewhere: only the white curve pixel per column, black background
    x = 400
    gy = np.float32(x) * (np.float32(1.0) / np.float32(512.0))
    pos_y = (H - 1) - int(gy * np.float32(H - 1))
    assert np.all(img[pos_y, x] == R.WHITE)
    assert np.all(img[0, x] == 0)


def test_contrast_curve_render_interleaved_floats():
    """The shader reinterprets the Point[] buffer as float[32]: it plots the
    first 16 points' x and y INTERLEAVED (contrast_curve_render.comp:13-16),
    scaled by MAX_CURVE_VALUE = 4."""
    px = np.array([0.5, 1.0], np.float32)
    py = np.array([2.0, 3.0], np.float32)
    img = R.render_contrast_curve(px, py)
    # floats = [0.5, 2.0, 1.0, 3.0, 0, 0, ...]
    expected = {0: 0.5, 1: 2.0, 2: 1.0, 3: 3.0}
    for t in range(32):
        x = int(np.float32(t) * (np.float32(W) / np.float32(32.0)))
        v = expected.get(t, 0.0)
        pos_y = H - int(np.float32(v) * (np.float32(H) / np.float32(4.0)))
        if pos_y <= H - 1:
            assert np.all(img[pos_y, x] == R.WHITE), (t, x, pos_y)
        # zero padding -> pos_y == 128 -> dropped; red 1.0-line dot remains
        red_y = int(np.float32(H) * (np.float32(3.0) / np.float32(4.0)))
        if pos_y != red_y:
            assert np.all(img[red_y, x] == R.RED)
    # nothing drawn between the 16-px columns
    assert np.all(img[:, 1] == 0)


def test_debug_dump_uses_faithful_renders(tmp_path):
    """dump_intermediates writes noise_hist.bmp / grad_hist.bmp via the
    faithful renderers (512x128 panels)."""
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils import debug, io
    hist = np.zeros(2048, np.int64)
    hist[4] = 10
    ghist = np.zeros(1024, np.int64)
    ghist[100] = 7
    inter = {
        "noise_hist_3": hist,
        "grad_hist": ghist,
        "grad_curve": (np.array([0.0, 1.0], np.float32),
                       np.array([0.0, 1.0], np.float32),
                       (0.1, 0.2, 0.9)),
        "contrast_curve_0": (np.array([0.0, 1.0], np.float32),
                             np.array([3.0, 1.0], np.float32)),
    }
    debug.dump_intermediates(inter, str(tmp_path))
    nh = io.load_bmp_rgb(tmp_path / "noise_hist.bmp")
    assert nh.shape == (H, W, 3)
    expected = R.render_noise_hist(hist, 10, 4)[..., :3]
    assert np.array_equal(nh, expected)
    gh = io.load_bmp_rgb(tmp_path / "grad_hist.bmp")
    expected_g = R.render_gradation_curve_debug(
        ghist, 7, 100, *inter["grad_curve"][0:2], 0.1, 0.2, 0.9)[..., :3]
    assert np.array_equal(gh, expected_g)
