"""End-to-end tests of the 3-phase xrays CLI pipeline (VERDICT r1 weak 5).

Subprocess-runs ``python -m graph_framework_tpu.cli.xrays`` the way a user
would - trace -> absorption -> power binning through the result file - and
asserts the output schema (xrays.cpp:1040-1076) and power monotonicity.
The reference has no such automated test either; its driver is exercised
manually.  Run on CPU (complex-capable backend) like the rest of the suite.
"""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def run_xrays(tmp_path, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    out = tmp_path / "result0.nc"
    cmd = [sys.executable, "-m", "graph_framework_tpu.cli.xrays",
           f"--output={out}", *extra]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]
    return out, proc


def read_all(path, names, complex_valued=False):
    from graph_framework_tpu.io.output import ResultFile
    with ResultFile(path, mode="r+") as f:
        nt = f.num_steps
        return {n: np.stack([
            f.read_step(i, [n], complex_valued=complex_valued)[n]
            for i in range(nt)]) for n in names}


def test_xrays_slab_three_phase(tmp_path):
    """Full pipeline on the analytic slab: trace 16 rays, weak-damping
    absorption, power binning; schema + physics checks."""
    out, _ = run_xrays(
        tmp_path,
        "--dispersion=cold_plasma", "--equilibrium=slab_density",
        "--num_rays=16", "--num_times=40", "--sub_steps=10",
        "--endtime=0.02",
        "--init_w_mean=1000.0", "--init_kx_mean=800.0",
        "--init_y_mean=0.0", "--init_kz_mean=100.0",
        "--init_kz_dist=normal", "--init_kz_sigma=0.0",
        "--absorption_model=weak_damping")

    assert out.exists()
    from graph_framework_tpu.io.output import ResultFile
    with ResultFile(out, mode="r+") as f:
        have = set(f.variables())
    # output schema: state + residual + absorption products
    # (xrays.cpp:1040-1076)
    for name in ("time", "residual", "w", "x", "y", "z", "kx", "ky", "kz",
                 "kamp", "power", "d_power"):
        assert name in have, f"missing output variable {name}"

    data = read_all(out, ["time", "x", "residual", "power"])
    nt = data["x"].shape[0]
    assert nt == 5                      # 40 times / 10 sub_steps + initial
    assert data["x"].shape[1] == 16
    # time rows advance uniformly
    t = data["time"][:, 0]
    np.testing.assert_allclose(np.diff(t), t[1] - t[0], rtol=1e-9)
    # rays stay on the dispersion surface
    assert float(np.nanmax(data["residual"][1:])) < 1e-10
    # power is a decaying exponential of accumulated Im(kamp) dl:
    # bounded by 1, monotonically non-increasing along each ray
    p = data["power"]
    assert np.all(p <= 1.0 + 1e-12)
    assert np.all(np.diff(p, axis=0) <= 1e-12)


def test_xrays_efit_trace_phase(tmp_path):
    """Trace phase on the EFIT tokamak: cold plasma, Newton-k init;
    asserts the residual stays small and rays move inward (the bench
    trajectory direction)."""
    out, _ = run_xrays(
        tmp_path,
        "--dispersion=cold_plasma", "--equilibrium=efit",
        "--equilibrium_file=/root/reference/graph_tests/efit.nc",
        "--num_rays=8", "--num_times=40", "--sub_steps=10",
        "--endtime=0.04",
        "--init_w_mean=500.0", "--init_kx_mean=-500.0",
        "--init_x_mean=2.5", "--init_y_mean=0.0", "--init_z_mean=0.0")

    data = read_all(out, ["x", "residual"])
    assert data["x"].shape == (5, 8)
    assert float(np.nanmax(data["residual"][1:])) < 1e-8
    assert np.all(data["x"][-1] < data["x"][0])     # rays propagate inward


def test_xrays_rejects_unknown_option():
    proc = subprocess.run(
        [sys.executable, "-m", "graph_framework_tpu.cli.xrays",
         "--no_such_option=1"],
        cwd=REPO, capture_output=True, text=True, timeout=120)
    assert proc.returncode != 0


def test_xrays_production_flags_vmec(tmp_path):
    """--vmec_fused (Pallas geometry, interpret mode on CPU) and
    --compensated (double-word state accumulation) through the CLI: the
    trace runs, writes the schema, and the endpoint matches the default
    path at f32 tolerance."""
    common = ["--dispersion=cold_plasma", "--equilibrium=vmec",
              "--equilibrium_file=/root/reference/graph_tests/vmec.nc",
              "--num_rays=4", "--num_times=10", "--sub_steps=5",
              "--f32", "--init_x_mean=0.5", "--init_y_mean=0.5",
              "--init_kx_mean=54.6"]
    default_dir = tmp_path / "d"
    default_dir.mkdir()
    out_d, _ = run_xrays(default_dir, *common)
    out_f, _ = run_xrays(tmp_path, *common, "--vmec_fused",
                         "--compensated")
    d = read_all(out_d, ["x", "kx"])
    f = read_all(out_f, ["x", "kx"])
    np.testing.assert_allclose(f["x"], d["x"], rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(f["kx"], d["kx"], rtol=5e-4, atol=5e-3)


def test_xrays_production_flags_efit_frozen(tmp_path):
    """--frozen_cells (+ --compensated + --timing_json) through the CLI:
    the EFIT trace runs, the endpoint matches the default path at the
    frozen-cell contract tolerance, and the per-phase timing JSON is
    written (the reference's timer story, timing.hpp)."""
    import json
    common = ["--dispersion=cold_plasma", "--equilibrium=efit",
              "--equilibrium_file=/root/reference/graph_tests/efit.nc",
              "--num_rays=4", "--num_times=20", "--sub_steps=5",
              "--endtime=0.002", "--f32",
              "--init_w_mean=500.0", "--init_kx_mean=-300.0",
              "--init_ky_mean=150.0", "--init_x_mean=2.2"]
    default_dir = tmp_path / "d"
    default_dir.mkdir()
    out_d, _ = run_xrays(default_dir, *common)
    tj = tmp_path / "timing.json"
    out_f, _ = run_xrays(tmp_path, *common, "--frozen_cells",
                         "--compensated", f"--timing_json={tj}")
    d = read_all(out_d, ["x", "kx"])
    f = read_all(out_f, ["x", "kx"])
    np.testing.assert_allclose(f["x"], d["x"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f["kx"], d["kx"], rtol=1e-5)
    t = json.loads(tj.read_text())
    for key in ("setup_s", "init_s", "compile_s", "trace_s"):
        assert key in t and t[key] >= 0.0, t


def test_production_stack_endpoint_accuracy(tmp_path):
    """The TPU production-stack configuration (frozen rk2 + freeze window
    + compensated + Pallas window kernel - the CLI's TPU default; here
    passed explicitly since tests run on CPU where the default stays
    portable) reproduces the portable f64 rk4 endpoint to well below the
    f32 noise floor - the 'faster AND more accurate' claim the default
    flip rests on."""
    # dt = endtime/num_times = 1e-4, the validated bench step size (the
    # rk2-equal-accuracy and freeze-window bounds are dt-dependent:
    # at 50x this dt the rk2-vs-rk4 truncation gap alone is ~1e-3)
    common = ["--num_rays=64", "--num_times=1000", "--endtime=0.1",
              "--sub_steps=10",
              "--dispersion=cold_plasma", "--equilibrium=efit",
              "--equilibrium_file=/root/reference/graph_tests/efit.nc",
              "--init_w_mean=650", "--init_x_mean=2.0",
              "--init_ky_mean=150", "--init_kx_mean=-400"]
    ref_out, _ = run_xrays(tmp_path, *common)   # portable: f64 rk4
    prod = tmp_path / "prod.nc"
    run_xrays(tmp_path, *common, f"--output={prod}", "--solver=rk2",
              "--frozen_cells", "--freeze_every=10", "--compensated",
              "--pallas_window", "--pallas_block_rows=2", "--f32")
    ref = read_all(ref_out, ["x", "y", "z"])
    got = read_all(prod, ["x", "y", "z"])
    for k in ("x", "y", "z"):
        assert got[k].shape == ref[k].shape
        dev = np.max(np.abs(got[k][-1] - ref[k][-1]))
        # f32 noise floor for this config is ~1e-4 (NOTES_r4 item 2);
        # the compensated production stack must sit well below it
        assert dev < 2.0e-5, (k, dev)
