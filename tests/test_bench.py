"""Drive the repo-root bench.py artifact (both modes) at tiny shapes.

The driver runs ``python bench.py`` on real TPU hardware at the end of every
round; this keeps its two code paths (forward throughput and the fwd+bwd
gradient mode) importable, runnable, and emitting the one-line JSON contract
on any machine.
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run(extra_env):
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        BENCH_RAYS="32",
        BENCH_STEPS="3",
        BENCH_SUB_STEPS="2",
        BENCH_GRAD_REPS="1",
        # tiny-shape runs must not pollute (or wait on) the TPU kernel cache
        JAX_COMPILATION_CACHE_DIR=str(REPO / ".jax_cache_test"),
        **extra_env,
    )
    # Force the CPU platform through jax.config as well: the sandbox
    # sitecustomize registers the TPU PJRT plugin, and the env var alone
    # does not always win (see tests/conftest.py).  Keeps this test off
    # the (single-process) TPU chip.
    bench = str(REPO / "bench.py")
    wrapper = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        f"__file__ = {bench!r}; exec(open(__file__).read())")
    out = subprocess.run(
        [sys.executable, "-c", wrapper], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr
    line = out.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    # driver contract: at least these four keys (extra diagnostic fields
    # like the dtype sweep and roofline/MFU accounting are allowed)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
    return rec


def test_bench_forward_contract():
    rec = _run({})
    assert "ray-steps/s" in rec["unit"]
    assert "EFIT" in rec["metric"]


def test_bench_grad_contract():
    rec = _run({"BENCH_MODE": "grad"})
    assert rec["metric"].startswith("fwd+bwd")


def test_bench_absorption_contract():
    rec = _run({"BENCH_MODE": "absorption"})
    assert rec["metric"].startswith("kamp updates")
    assert rec["unit"] == "ray-slices/s"


def test_bench_korc_contract():
    rec = _run({"BENCH_MODE": "korc", "BENCH_PARTICLES": "8192",
                "BENCH_KORC_STEPS": "20", "BENCH_KORC_CHUNK": "10"})
    assert "particle-steps/s" in rec["unit"]
    assert rec["detail"]["pallas_multistep_kernel"] is False  # CPU run
