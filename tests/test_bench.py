"""bench.py's reliability contract (round-3 postmortem: the driver captured
no perf line).  The invariant: bench.py prints EXACTLY ONE parseable JSON
result line and exits 0 on every failure path, within its hard deadline."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(env_extra, timeout):
    env = {k: v for k, v in os.environ.items()
           if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    # reuse the suite's persistent compile cache (conftest) in the child so
    # the fresh-sample test stays cheap on repeat runs; "none" avoids the
    # serialize-executable incompatibility documented in conftest
    cache = os.environ.get(
        "MUSICA_TEST_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "musica_test_xla"))
    if cache:
        env.setdefault("JAX_COMPILATION_CACHE_DIR", cache)
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
        env.setdefault("JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES", "none")
    env.update(env_extra)
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=timeout, cwd=REPO)


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.strip().splitlines() if ln.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {stdout!r}"
    return json.loads(lines[0])


def test_bench_emits_stale_last_good_when_no_sample_lands():
    """With zero sample attempts allowed, bench.py must immediately emit
    the persisted last-good measurement flagged stale (this is what a
    fully-dead TPU tunnel run produces, bounded by the watchdog)."""
    p = _run_bench({"MUSICA_BENCH_SAMPLES": "0"}, timeout=60)
    assert p.returncode == 0, p.stderr[-500:]
    rec = _parse_single_json_line(p.stdout)
    assert rec["metric"] == "musica_3072_gpix_per_s"
    assert rec["unit"] == "GPix/s"
    assert rec.get("stale") is True
    assert rec["value"] > 0  # the seeded/persisted artifact is present
    assert rec["vs_baseline"] > 0


def test_bench_fresh_sample_path_cpu_reduced_size():
    """End-to-end fresh-sample path: one bounded child measures a reduced-size
    pipeline on the CPU backend, the parent parses and emits it un-stale --
    and the non-headline run must NOT clobber the persisted 3072/TPU
    last-good artifact (pollution guard)."""
    artifact = os.path.join(REPO, "artifacts", "bench_last_good.json")
    with open(artifact) as f:
        before = f.read()
    p = _run_bench({"MUSICA_BENCH_SAMPLES": "1",
                    "MUSICA_BENCH_SIZE": "128",
                    "MUSICA_BENCH_BATCH": "4",
                    "MUSICA_BENCH_QUICK_FIRST": "0"}, timeout=420)
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert rec.get("stale") is None, rec
    assert rec["metric"] == "musica_3072_gpix_per_s"
    assert rec["value"] > 0
    assert rec["platform"] == "cpu"
    assert rec["size"] == 128
    assert rec["samples"] == 1
    assert rec["batch_gpix"] > 0, "full-protocol child must run the batch path"
    with open(artifact) as f:
        assert f.read() == before, "reduced-size CPU run polluted last-good"


def test_bench_quick_first_child_skips_batch():
    """The round-5 quick first sample: a single child with quick-first on
    must land a fresh (un-stale) single-image measurement with the batch
    leg skipped."""
    p = _run_bench({"MUSICA_BENCH_SAMPLES": "1",
                    "MUSICA_BENCH_SIZE": "128"}, timeout=420)
    assert p.returncode == 0, p.stderr[-800:]
    rec = _parse_single_json_line(p.stdout)
    assert rec.get("stale") is None, rec
    assert rec["quick"] is True
    assert rec["batch_gpix"] == 0.0
    assert rec["value"] > 0


def test_bench_escalation_rescues_after_dead_first_child():
    """The round-5 escalation ladder: when the first (quick) child dies at
    its cap -- simulated with a 1 s quick cap no child can meet -- the next
    child gets the escalated window and must land a fresh (un-stale)
    sample."""
    p = _run_bench({"MUSICA_BENCH_SAMPLES": "3",
                    "MUSICA_BENCH_QUICK_CAP": "1",
                    "MUSICA_BENCH_SIZE": "128"}, timeout=420)
    assert p.returncode == 0, p.stderr[-800:]
    assert "produced no result" in p.stderr  # the 1 s quick child died
    rec = _parse_single_json_line(p.stdout)
    assert rec.get("stale") is None, rec
    # best may come from the escalated quick child OR a later full child
    # that ran once results existed -- either way the dead first child must
    # not have prevented a fresh sample
    assert rec["value"] > 0
    assert rec["samples"] >= 1


def test_persist_keeps_best_per_code_version(tmp_path, monkeypatch):
    """A weaker sample of the SAME build must not clobber a better one;
    any sample of a NEW build replaces old-code records outright."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setattr(bench, "LAST_GOOD_PATH",
                        str(tmp_path / "last_good.json"))

    def value():
        with open(bench.LAST_GOOD_PATH) as f:
            return json.load(f)["value"]

    bench._persist_last_good({"value": 2.5, "code": "aaaa"})
    assert value() == 2.5
    bench._persist_last_good({"value": 2.1, "code": "aaaa"})  # weaker, same
    assert value() == 2.5
    bench._persist_last_good({"value": 2.7, "code": "aaaa"})  # better, same
    assert value() == 2.7
    bench._persist_last_good({"value": 2.0, "code": "bbbb"})  # new build
    assert value() == 2.0
    bench._persist_last_good({"value": 1.9, "code": None})  # unknown build
    assert value() == 1.9


def test_bench_last_good_artifact_schema():
    """The persisted artifact must itself be replayable: the keys the stale
    path emits are all present."""
    with open(os.path.join(REPO, "artifacts", "bench_last_good.json")) as f:
        rec = json.load(f)
    for k in ("metric", "value", "unit", "vs_baseline", "measured_at"):
        assert k in rec, k
