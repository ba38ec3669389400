"""Config schedules against the reference formulas
(src/vk_processing.cpp:259-331, include/vk_processing.h:43-49)."""

import math

import pytest

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import (
    MusicaConfig, num_pyramid_levels, pyramid_level_sizes,
)


def test_pyramid_structure_3072():
    cfg = MusicaConfig(image_size=3072)
    assert cfg.pyramid_levels == 12
    assert cfg.level_sizes == (3072, 1536, 768, 384, 192, 96, 48, 24, 12, 6,
                               3, 2, 1)
    assert cfg.analysis_levels == (0, 1, 2, 3)
    assert cfg.hist_coverage == 3072


def test_contrast_schedule_exponential_3072():
    """highContrastFactor = 0.2^((i-3)/8) for i >= 3; lowContrastFactor =
    3^(1 - i/3) for i < 3 (the default exponential variants)."""
    cfg = MusicaConfig(image_size=3072)
    for i, (lcf, hcf) in enumerate(cfg.contrast_factors):
        if i < 3:
            assert hcf == 1.0
            assert abs(lcf - 3.0 ** (1.0 - i / 3.0)) < 1e-12
        else:
            assert lcf == 1.0
            assert abs(hcf - 0.2 ** ((i - 3) / 8.0)) < 1e-12
    # endpoints
    assert abs(cfg.contrast_factors[0][0] - 3.0) < 1e-12
    assert abs(cfg.contrast_factors[11][1] - 0.2) < 1e-12


def test_contrast_schedule_linear_variants():
    """LINEAR_{LOW,HIGH}_CONTRAST_LEVELS_REDUCTION
    (include/vk_processing.h:17-18, src/vk_processing.cpp:262-268,281-287)."""
    cfg = MusicaConfig(image_size=3072, linear_low_contrast=True,
                       linear_high_contrast=True)
    levels, coarser = 12, 3
    for i, (lcf, hcf) in enumerate(cfg.contrast_factors):
        if i < coarser:
            assert abs(lcf - (3.0 - i * (2.0 / 3.0))) < 1e-12
            assert hcf == 1.0
        else:
            assert lcf == 1.0
            expected = 1.0 - (i - coarser) * (1.0 - 0.2) / (levels - coarser - 1)
            assert abs(hcf - expected) < 1e-12


def test_noise_reduction_schedule():
    """Level L uses lowFactor = 0.6 + 0.4*L/3, highFactor = 1.2 - 0.2*L/3
    (src/vk_processing.cpp:321-325 with the reversed buffer binding at
    :1518-1520 that aligns the schedule index with the pyramid level)."""
    cfg = MusicaConfig(image_size=3072)
    for lvl, (lo_c, lo_f, hi_c, hi_f) in enumerate(cfg.noise_reduction_params):
        assert lo_c == 3.0 and hi_c == 9.0
        assert abs(lo_f - (0.6 + 0.4 * lvl / 3)) < 1e-12
        assert abs(hi_f - (1.2 - 0.2 * lvl / 3)) < 1e-12


@pytest.mark.parametrize("n,expected", [(3072, 12), (1792, 11), (512, 9),
                                        (100, 7), (4, 2)])
def test_num_levels(n, expected):
    assert num_pyramid_levels(n) == expected
    sizes = pyramid_level_sizes(n)
    assert sizes[0] == n
    assert sizes[-1] == 1 or len(sizes) == expected + 1


def test_config_hashable_and_static():
    a = MusicaConfig(image_size=512)
    b = MusicaConfig(image_size=512)
    assert a == b and hash(a) == hash(b)
    c = a.with_(quirks=False)
    assert c != a and c.image_size == 512


def test_hist_coverage_quirk():
    assert MusicaConfig(image_size=3072).hist_coverage == 3072
    assert MusicaConfig(image_size=1792).hist_coverage == 1536  # rounds down
    assert MusicaConfig(image_size=256).hist_coverage == 0
    assert MusicaConfig(image_size=256, quirks=False).hist_coverage == 256
