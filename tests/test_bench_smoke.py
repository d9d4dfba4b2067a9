"""Smoke-test bench.py — the artifact-of-record script.

The driver's round-end benchmark parses bench.py's final JSON line; a
bitrotted bench records nothing for the round, so both of its code paths
(plain single-config and host-dispatched ensemble micro-batching) are
exercised here at smoke size on CPU. Subprocesses: bench.py configures
its own platform/cache, and the JSON contract (one parseable line per
config on stdout) is part of what is being tested.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(tmp_path, extra_env):
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "PAM_BENCH_MICRO": "kessler",
        "PAM_BENCH_SGS": "none",
        "PAM_BENCH_STEPS": "2",
        "PAM_BENCH_REPS": "1",
        "PAM_BENCH_TRACE_STEPS": "1",
        "PAM_JAX_CACHE": str(tmp_path / "cache"),
    })
    env.update(extra_env)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")], env=env,
        capture_output=True, text=True, timeout=540, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.strip()]
    assert lines, out.stderr[-2000:]
    rec = json.loads(lines[-1])  # the driver parses the FINAL line
    assert rec["unit"] == "gridpoint-steps/s"
    assert rec["value"] > 0
    assert rec["ms_per_step"] > 0
    assert rec["reps"] == 1
    return rec


@pytest.mark.slow
def test_bench_single_config(tmp_path):
    rec = run_bench(tmp_path, {"PAM_BENCH_NENS": "4"})
    # the kessler line of record carries the baseline ratio + caveat
    assert "vs_baseline" in rec and "baseline_note" in rec


@pytest.mark.slow
def test_bench_hostchunked_branch(tmp_path):
    # drv nens (2) != run nens (4) routes through the host-dispatched
    # micro-batch branch (bench.py run_config)
    rec = run_bench(tmp_path, {"PAM_BENCH_NENS": "4",
                               "PAM_BENCH_ENS_MICROBATCH": "2"})
    assert rec["value"] > 0
