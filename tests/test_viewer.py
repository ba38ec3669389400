"""Interactive viewer (utils/viewer.py) -- the live analogue of the
reference's GLFW/ImGui shell (src/app.cpp:25-152)."""

import urllib.error
import urllib.request

import numpy as np
import pytest

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils import io as uio
from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils.viewer import serve


@pytest.fixture(scope="module")
def viewer(tmp_path_factory, request):
    d = tmp_path_factory.mktemp("viewer")
    rng = np.random.default_rng(3)
    raw = (rng.random((256, 256)) * 40000).astype(np.uint16)
    uio.save_raw(str(d / "in.raw"), raw)
    cfg = MusicaConfig(image_size=256)
    server, state = serve(str(d / "in.raw"), cfg, transpose=True,
                          port=0, report_dir=str(d / "report"), block=False)
    request.addfinalizer(server.shutdown)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    return base, state, d


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.read()


def _post(url):
    req = urllib.request.Request(url, method="POST", data=b"")
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, r.read()


def test_viewer_page_and_panels(viewer):
    base, state, _ = viewer
    status, body = _get(base + "/")
    assert status == 200
    html = body.decode()
    for frag in ("execute()", "flip buffer", "debugProcess()",
                 "/img/out", "noise peak bin L0"):
        assert frag in html, frag
    # out image + every render panel must be a decodable BMP
    for name in ["out"] + list(state.panels):
        s, blob = _get(f"{base}/img/{name}")
        assert s == 200 and blob[:2] == b"BM", name
    with pytest.raises(urllib.error.HTTPError) as exc:
        _get(base + "/img/nope")
    assert exc.value.code == 404


def test_viewer_execute_flips_double_buffer(viewer):
    base, state, _ = viewer
    n0, cur0 = state.n_executes, state.current
    _post(base + "/execute")
    assert state.n_executes == n0 + 1
    assert len(state.outputs) == 2  # double buffer filled
    # same input -> both buffers identical (the reference reprocesses the
    # same raw too); flip must change currentIndex
    np.testing.assert_array_equal(state.outputs[0], state.outputs[1])
    cur = state.current
    _post(base + "/flip")
    assert state.current == 1 - cur


def test_viewer_debug_dump(viewer):
    base, _, d = viewer
    s, body = _post(base + "/debug")
    assert s == 200 and b"index.html" in body
    assert (d / "report" / "index.html").exists()
    assert (d / "report" / "out.bmp").exists()
