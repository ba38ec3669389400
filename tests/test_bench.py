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


def test_bench_last_good_artifact_schema():
    """The persisted artifact must itself be replayable: the keys the stale
    path emits are all present."""
    with open(os.path.join(REPO, "artifacts", "bench_last_good.json")) as f:
        rec = json.load(f)
    for k in ("metric", "value", "unit", "vs_baseline", "measured_at"):
        assert k in rec, k
