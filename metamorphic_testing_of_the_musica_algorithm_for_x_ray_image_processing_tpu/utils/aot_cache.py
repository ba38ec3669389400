"""AOT cache of the compiled pipeline executable across processes.

The pipeline's compile is expensive (1.5-10 min over the axon TPU relay,
~20-40 s locally), and every fresh process pays it again: JAX's persistent
compilation cache does not work through the relay (the cache-hit path
hangs; docs/PERFORMANCE.md).  This module instead serializes the COMPILED
executable (``jax.experimental.serialize_executable``) keyed on everything
that could invalidate it -- jax/jaxlib versions, backend platform+version,
device kind, config hash, input shape/dtype -- and transparently falls
back to a normal ``jax.jit`` compile when loading fails for any reason.

Usage:
    fn = cached_compile(lambda im: musica_forward(im, cfg)["out_u8"],
                        key_parts=("process", cfg), example_args=(img,))
    out = fn(img)

The cache directory defaults to ``~/.cache/musica_tpu_aot`` and can be
overridden with ``MUSICA_AOT_CACHE`` (empty string disables caching).

SECURITY: cache entries are pickled (JAX's own deserialize_and_load is
pickle-based), so loading an entry executes whatever the blob contains.
``MUSICA_AOT_CACHE`` must therefore point at a TRUSTED, user-owned
directory -- never a shared or world-writable path like /tmp.  The default
directory is created with mode 0o700.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path
from typing import Callable, Optional, Sequence

_SENTINEL_OK = b"MUSICA_AOT1"


def cache_dir() -> Optional[Path]:
    env = os.environ.get("MUSICA_AOT_CACHE")
    if env == "":
        return None
    return Path(env) if env else Path.home() / ".cache" / "musica_tpu_aot"


def _source_digest() -> str:
    """Digest of the sources the TRACED computation is closed over
    (config.py + models/ + ops/ + parallel/), so a cached executable
    compiled from older code is invalidated when the pipeline
    implementation changes (the compiled output is bit-identical across
    optimizations, but serving a stale executable would silently discard
    their performance).

    Host-side modules (cli, utils, testing) are deliberately excluded:
    they never affect the lowered HLO, and including them would turn every
    harness edit into a multi-minute remote recompile."""
    pkg_root = Path(__file__).resolve().parent.parent
    return _digest_tree(pkg_root)


def _digest_tree(pkg_root: Path) -> str:
    paths = [pkg_root / "config.py"]
    for sub in ("models", "ops", "parallel"):
        paths.extend((pkg_root / sub).rglob("*.py"))
    h = hashlib.sha256()
    for p in sorted(paths):
        h.update(str(p.relative_to(pkg_root)).encode())
        h.update(p.read_bytes())
    return h.hexdigest()[:16]


def _cache_key(key_parts: Sequence, example_args: tuple) -> str:
    import jax

    dev = jax.devices()[0]
    client = dev.client
    parts = [
        jax.__version__,
        getattr(__import__("jaxlib"), "__version__", "?"),
        client.platform,
        getattr(client, "platform_version", "?"),
        getattr(dev, "device_kind", "?"),
        str(len(jax.devices())),
        _source_digest(),
    ]
    for p in key_parts:
        parts.append(repr(p))
    for a in example_args:
        parts.append(f"{getattr(a, 'shape', None)}:{getattr(a, 'dtype', None)}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:32]


def cached_compile(fn: Callable, key_parts: Sequence, example_args: tuple,
                   verbose: bool = False) -> Callable:
    """Return a compiled callable for ``fn`` at ``example_args``'s shapes.

    Loads a serialized executable when a valid cache entry exists, else
    compiles with ``jax.jit`` and writes the entry.  Any failure in the
    serialize/deserialize path silently degrades to the plain jit compile
    (a stale or cross-version entry must never break processing).
    """
    import jax

    d = cache_dir()
    jitted = jax.jit(fn)
    if d is None:
        return jitted
    try:
        key = _cache_key(key_parts, example_args)
    except Exception:
        return jitted
    path = d / f"{key}.bin"

    # JAX's persistent compilation cache (when configured, e.g. by
    # tests/conftest.py for the CPU suite) corrupts BOTH directions of the
    # serialize_executable round trip on a multi-device CPU backend: an
    # executable served from that cache re-serializes into a blob whose
    # dispatch fails, and deserialize_and_load itself produces a broken
    # executable ("Buffer Definition Event: Function ... not found") when
    # the cache is merely enabled.  Bypass it around this module's load and
    # compile (the axon/TPU path never configures it, so this is a no-op
    # there).
    def _xla_cache_bypassed(op):
        xla_dir = getattr(jax.config, "jax_compilation_cache_dir", None)
        try:
            if xla_dir:
                jax.config.update("jax_compilation_cache_dir", None)
            return op()
        finally:
            if xla_dir:
                jax.config.update("jax_compilation_cache_dir", xla_dir)

    if path.exists():
        try:
            from jax.experimental import serialize_executable as se

            blob = path.read_bytes()
            if blob[: len(_SENTINEL_OK)] == _SENTINEL_OK:
                payload, in_tree, out_tree, device_ids = _unpack(blob)
                # deserialize_and_load defaults execution_devices to ALL
                # backend devices; an executable compiled for one device
                # then fails at dispatch ("expected N shards") under a
                # forced multi-device backend -- pin the original devices.
                by_id = {d.id: d for d in jax.devices()}
                exec_devices = (
                    [by_id[i] for i in device_ids]
                    if device_ids and all(i in by_id for i in device_ids)
                    else None)
                compiled = _xla_cache_bypassed(
                    lambda: se.deserialize_and_load(
                        payload, in_tree, out_tree,
                        execution_devices=exec_devices))
                # Deserialization can succeed and still fail at dispatch
                # (e.g. XLA:CPU records tuning pseudo-features like
                # +prefer-no-scatter that the host feature probe never
                # reports) -- validate with one real execution before
                # trusting the entry.
                jax.block_until_ready(compiled(*example_args))
                if verbose:
                    print(f"aot-cache: loaded {path.name}")
                return compiled
        except Exception as e:  # stale/corrupt/cross-version entry
            if verbose:
                print(f"aot-cache: load failed ({type(e).__name__}: {e}); "
                      "recompiling")
            try:
                path.unlink()
            except OSError:
                pass

    # The saved entry must always come from a fresh build (see
    # _xla_cache_bypassed above).
    compiled = _xla_cache_bypassed(
        lambda: jitted.lower(*example_args).compile())
    try:
        from jax.experimental import serialize_executable as se

        payload, in_tree, out_tree = se.serialize(compiled)
        try:
            device_ids = [
                dev.id for dev in
                compiled._executable.xla_executable.local_devices()]
        except Exception:
            device_ids = []
        d.mkdir(parents=True, exist_ok=True, mode=0o700)
        tmp = path.with_suffix(".tmp")
        tmp.write_bytes(_pack(payload, in_tree, out_tree, device_ids))
        tmp.replace(path)
        if verbose:
            print(f"aot-cache: saved {path.name}")
    except Exception as e:
        if verbose:
            print(f"aot-cache: save failed ({type(e).__name__}: {e})")
    return compiled


def _pack(payload: bytes, in_tree, out_tree, device_ids) -> bytes:
    import pickle

    return _SENTINEL_OK + pickle.dumps(
        (payload, in_tree, out_tree, device_ids))


def _unpack(blob: bytes):
    import pickle

    return pickle.loads(blob[len(_SENTINEL_OK):])
