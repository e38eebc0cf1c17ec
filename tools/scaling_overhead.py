"""Sharding-overhead measurement on a virtual multi-device CPU mesh.

The reference publishes a single-node strong-scaling figure
(graph_docs/code_performance.dox:9-40, StrongScaling.png); BASELINE.md's
multi-host target is >=90% efficiency.  Real multi-chip hardware is not
available in this environment, so this tool measures the one thing the
virtual 8-device CPU mesh CAN honestly prove: the SPMD partitioning
overhead of the sharded step program at constant total work.

Method: a fixed total ray ensemble is traced (rk4 + cold_plasma + EFIT)
on 1, 2, 4 and 8 virtual XLA:CPU devices.  All configurations run on the
same physical core pool, so the compute cost is constant; any walltime
increase over the single-device run is the cost of partitioning: per-shard
dispatch, layout, and the (collective-free by design) cross-device
program structure.  Overhead_N = t_N / t_1 - 1.

The workload exchanges zero bytes between shards per step (SURVEY.md
section 2.6: the reference's multi-device scheme has no communication at
all, and ours shards the ray axis the same way), so on real chips the
per-chip throughput is flat up to I/O: the honest pod-slice projection is
single-chip ray-steps/s x N, derated by the overhead bound measured here.

Each device count runs in a fresh subprocess because
xla_force_host_platform_device_count must be set before JAX initializes.

Writes SCALING_r03.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

TOTAL_RAYS = int(os.environ.get("SCALING_RAYS", 16384))
NUM_STEPS = int(os.environ.get("SCALING_STEPS", 20))
SUB_STEPS = int(os.environ.get("SCALING_SUB_STEPS", 5))
REPS = int(os.environ.get("SCALING_REPS", 5))

_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from graph_framework_tpu.models import dispersion as disp
from graph_framework_tpu.models.efit import make_efit
from graph_framework_tpu.parallel.mesh import ray_mesh, shard_rays
from graph_framework_tpu.solver import Solver, make_ray_state, init_k

n_dev = {n_dev}
assert len(jax.devices()) == n_dev, jax.devices()

eq = make_efit("/root/reference/graph_tests/efit.nc", dtype=jnp.float32)
st = make_ray_state({total_rays}, w=900.0, x=1.8, y=0.0, z=0.0,
                    kx=-800.0, ky=0.0, kz=100.0, dtype=jnp.float32)
st = init_k(st, disp.cold_plasma, eq, "kx", tolerance=1e-8)
mesh = ray_mesh()
st = shard_rays(st, mesh)

sol = Solver(disp.cold_plasma, eq, method="rk4", dt=1.0e-6,
             sub_steps={sub_steps})
step = sol.raw_step_fn()

def go(c):
    def body(c, _):
        return step(c), None
    out, _ = jax.lax.scan(body, c, None, length={num_steps})
    return out

run = jax.jit(go)
out = jax.block_until_ready(run(st))          # compile + warm
best = float("inf")
for _ in range({reps}):
    t0 = time.perf_counter()
    out = jax.block_until_ready(run(st))
    best = min(best, time.perf_counter() - t0)
x0 = float(out.x[0])
print(json.dumps({{"n_devices": n_dev, "t_steps_s": best, "final_x0": x0}}))
"""


def run_child(n_dev: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n_dev}"
                        ).strip()
    src = _CHILD.format(repo=str(REPO), n_dev=n_dev,
                        total_rays=TOTAL_RAYS, num_steps=NUM_STEPS,
                        sub_steps=SUB_STEPS, reps=REPS)
    out = subprocess.run([sys.executable, "-c", src], env=env,
                         capture_output=True, text=True, timeout=1200)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    rows = [run_child(n) for n in (1, 2, 4, 8)]
    t1 = rows[0]["t_steps_s"]
    x1 = rows[0]["final_x0"]
    for r in rows:
        r["overhead_vs_1dev"] = round(r["t_steps_s"] / t1 - 1.0, 4)
        # numerical identity across shardings (same program, same result)
        r["final_x0_matches_1dev"] = bool(abs(r["final_x0"] - x1)
                                          <= 1e-6 * max(1.0, abs(x1)))
    ray_steps = TOTAL_RAYS * NUM_STEPS * SUB_STEPS
    result = {
        "method": "constant total work (rk4+cold_plasma+EFIT, "
                  f"{TOTAL_RAYS} rays x {NUM_STEPS}x{SUB_STEPS} steps, "
                  "f32) on 1/2/4/8 virtual XLA:CPU devices sharing one "
                  "core pool; overhead_N = t_N/t_1 - 1 isolates SPMD "
                  "partitioning cost because compute is conserved",
        "ray_steps": ray_steps,
        "rows": rows,
        "max_overhead": max(r["overhead_vs_1dev"] for r in rows),
        "projection": {
            "note": "the step program is collective-free (zero bytes "
                    "exchanged between ray shards; SURVEY.md 2.6), so "
                    "pod-slice throughput projects as single-chip "
                    "ray-steps/s x N derated by the overhead bound above",
            "single_chip_ray_steps_per_s": 46.79e6,
            "v5e_8_projection": 46.79e6 * 8,
            "v5e_256_projection": 46.79e6 * 256,
            "efficiency_target": 0.90,
        },
    }
    path = REPO / "SCALING_r03.json"
    path.write_text(json.dumps(result, indent=1))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
