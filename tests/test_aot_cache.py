"""AOT executable cache (utils/aot_cache.py): save/load/fallback behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.utils import aot_cache


@pytest.fixture
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("MUSICA_AOT_CACHE", str(tmp_path / "aot"))
    return tmp_path / "aot"


def test_cached_compile_save_then_load(cache_env, capsys):
    x = jnp.arange(64, dtype=jnp.float32).reshape(8, 8)

    def fn(v):
        return (v * 2.0 + 1.0).sum()

    f1 = aot_cache.cached_compile(fn, ("t1",), (x,), verbose=True)
    out1 = np.asarray(f1(x))
    assert "saved" in capsys.readouterr().out
    files = list(cache_env.glob("*.bin"))
    assert len(files) == 1

    # a second cached_compile (fresh-process analogue) must LOAD, not compile
    f2 = aot_cache.cached_compile(fn, ("t1",), (x,), verbose=True)
    assert "loaded" in capsys.readouterr().out
    np.testing.assert_array_equal(np.asarray(f2(x)), out1)


def test_cached_compile_key_separates_configs(cache_env):
    x = jnp.ones((4, 4))
    aot_cache.cached_compile(lambda v: v + 1, ("a",), (x,))
    aot_cache.cached_compile(lambda v: v + 2, ("b",), (x,))
    assert len(list(cache_env.glob("*.bin"))) == 2


def test_corrupt_entry_falls_back(cache_env, capsys):
    x = jnp.ones((4, 4))

    def fn(v):
        return v * 3.0

    aot_cache.cached_compile(fn, ("c",), (x,))
    (entry,) = cache_env.glob("*.bin")
    entry.write_bytes(aot_cache._SENTINEL_OK + b"garbage")

    f = aot_cache.cached_compile(fn, ("c",), (x,), verbose=True)
    out = capsys.readouterr().out
    assert "load failed" in out
    np.testing.assert_array_equal(np.asarray(f(x)), np.full((4, 4), 3.0))
    # the corrupt entry was dropped and re-written by the fallback compile
    (entry2,) = cache_env.glob("*.bin")
    assert entry2.read_bytes() != aot_cache._SENTINEL_OK + b"garbage"


def test_disabled_via_empty_env(monkeypatch, tmp_path):
    monkeypatch.setenv("MUSICA_AOT_CACHE", "")
    x = jnp.ones((4, 4))
    f = aot_cache.cached_compile(lambda v: v - 1, ("d",), (x,))
    np.testing.assert_array_equal(np.asarray(f(x)), np.zeros((4, 4)))
    assert aot_cache.cache_dir() is None


def test_pipeline_through_cache_matches_jit(cache_env, phantom_256):
    """The full pipeline compiled through the cache is bit-identical to the
    plain jit path (same executable semantics)."""
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.config import MusicaConfig
    from metamorphic_testing_of_the_musica_algorithm_for_x_ray_image_processing_tpu.models import musica

    cfg = MusicaConfig(image_size=256)
    img = jnp.asarray(phantom_256)
    ref = np.asarray(musica.process_jit(img, cfg))

    fwd = aot_cache.cached_compile(
        lambda im: musica.musica_forward(im, cfg)["out_u8"],
        key_parts=("process", cfg), example_args=(img,))
    np.testing.assert_array_equal(np.asarray(fwd(img)), ref)

    # reload path too
    fwd2 = aot_cache.cached_compile(
        lambda im: musica.musica_forward(im, cfg)["out_u8"],
        key_parts=("process", cfg), example_args=(img,))
    np.testing.assert_array_equal(np.asarray(fwd2(img)), ref)


def test_source_digest_scope(tmp_path):
    """The digest tracks the TRACED sources (config.py, models/, ops/,
    parallel/) and ignores host-side modules (cli/utils/testing), so harness
    edits do not invalidate cached executables."""
    pkg = tmp_path / "pkg"
    for sub in ("models", "ops", "parallel", "utils", "testing"):
        (pkg / sub).mkdir(parents=True)
        (pkg / sub / "a.py").write_text(f"# {sub}\n")
    (pkg / "config.py").write_text("X = 1\n")
    (pkg / "cli.py").write_text("# cli\n")

    d0 = aot_cache._digest_tree(pkg)
    assert d0 == aot_cache._digest_tree(pkg)  # deterministic

    (pkg / "cli.py").write_text("# cli CHANGED\n")
    (pkg / "utils" / "a.py").write_text("# utils CHANGED\n")
    (pkg / "testing" / "a.py").write_text("# testing CHANGED\n")
    assert aot_cache._digest_tree(pkg) == d0  # host-side edits ignored

    (pkg / "ops" / "a.py").write_text("# ops CHANGED\n")
    d1 = aot_cache._digest_tree(pkg)
    assert d1 != d0  # traced-source edits invalidate

    (pkg / "config.py").write_text("X = 2\n")
    assert aot_cache._digest_tree(pkg) not in (d0, d1)
