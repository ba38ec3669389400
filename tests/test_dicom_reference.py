"""DICOM ground-truth path (campaign.load_reference_image /
dicom_to_reference vs test/metamorphic_test/script.py:396-405).

pydicom is not installed in this environment, so the 16->8-bit + inversion
conversion is verified against the reference's EXACT PIL chain
(Image.fromarray -> mode 'I;16' -> point(i * (1/256)).convert('L') ->
convert('RGB') -> ImageOps.invert), and the full loader is exercised with a
stub pydicom module feeding it a synthetic dataset.
"""

import sys
import types

import numpy as np
import pytest
from PIL import Image, ImageOps

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.testing.campaign import (
    dicom_to_reference, load_reference_image)


def _reference_pil_chain(arr: np.ndarray) -> np.ndarray:
    """Verbatim port of script.py:396-405 (minus the dcmread)."""
    di = Image.fromarray(arr)
    if di.mode == "I;16":
        di_point = di.point(lambda i: i * (1.0 / 256)).convert("L")
        di = di_point.convert("RGB")
    else:
        di = di.convert("RGB")
    return np.array(ImageOps.invert(di))[:, :, 0]


def test_u16_conversion_matches_reference_pil_chain(rng):
    arr = rng.integers(0, 65536, (64, 64)).astype(np.uint16)
    assert Image.fromarray(arr).mode == "I;16"  # the branch the reference takes
    np.testing.assert_array_equal(dicom_to_reference(arr),
                                  _reference_pil_chain(arr))


def test_u16_conversion_extremes():
    arr = np.array([[0, 255, 256, 257, 65535]], np.uint16)
    out = dicom_to_reference(arr)
    # v // 256 then invert: 0->255, 255->255, 256->254, 65535->0
    np.testing.assert_array_equal(out, [[255, 255, 254, 254, 0]])


def test_u8_passthrough_matches_reference_pil_chain(rng):
    arr = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    np.testing.assert_array_equal(dicom_to_reference(arr),
                                  _reference_pil_chain(arr))


def test_load_reference_image_via_stub_pydicom(rng, monkeypatch, tmp_path):
    """Round-trip the full loader with a stub pydicom exposing dcmread()."""
    arr = rng.integers(0, 65536, (48, 48)).astype(np.uint16)
    p = tmp_path / "proc.dcm"
    p.write_bytes(arr.tobytes())

    stub = types.ModuleType("pydicom")

    def dcmread(path):
        data = np.frombuffer(open(path, "rb").read(), np.uint16).reshape(48, 48)
        return types.SimpleNamespace(pixel_array=data)

    stub.dcmread = dcmread
    monkeypatch.setitem(sys.modules, "pydicom", stub)
    out = load_reference_image(str(p), 48)
    np.testing.assert_array_equal(out, _reference_pil_chain(arr))


def test_load_reference_image_none_without_pydicom(monkeypatch):
    monkeypatch.setitem(sys.modules, "pydicom", None)  # import -> ImportError
    assert load_reference_image("/nonexistent.dcm", 8) is None
