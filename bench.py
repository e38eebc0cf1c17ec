"""Benchmark: ray-steps/s/chip on the reference's xrays_bench configuration.

Mirrors graph_benchmark/xrays_bench.cpp:41-132 - rk4 + cold_plasma +
efit.nc, 100k rays, sub_steps=10 - and reports integrator ray-steps per
second per chip (setup/init/compile excluded, as the reference's scaling
measurements do; graph_docs/code_performance.dox:24-25).

Prints exactly one JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline normalizes against 1e6 ray-steps/s/chip - the order of the
reference's single-A100 throughput inferred from its "800x one CPU core"
claim (code_performance.dox:27-30); no absolute numbers are published.
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# persistent compile cache: first-ever compile of the step kernel takes
# minutes on this backend; subsequent runs hit the cache.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

EFIT_FILE = "/root/reference/graph_tests/efit.nc"
VMEC_FILE = "/root/reference/graph_tests/vmec.nc"
BENCH_EQ = os.environ.get("BENCH_EQ", "efit")     # efit | vmec (config 4)
BENCH_MODE = os.environ.get("BENCH_MODE", "fwd")  # fwd | grad (fwd+bwd)
NUM_RAYS = int(os.environ.get("BENCH_RAYS", 100_000))
NUM_STEPS = int(os.environ.get("BENCH_STEPS", 100))   # recorded steps
SUB_STEPS = int(os.environ.get("BENCH_SUB_STEPS", 10))
BASELINE_RAY_STEPS_PER_S = 1.0e6


def main():
    from graph_framework_tpu.models import make_efit, make_vmec
    from graph_framework_tpu.models import dispersion as disp
    from graph_framework_tpu.solver import Solver, make_ray_state, init_k

    dtype = jnp.float32
    if BENCH_EQ == "vmec":
        # BASELINE.json staged config 4: 3D stellarator trace in flux coords
        eq = make_vmec(VMEC_FILE, dtype=dtype)
        state = make_ray_state(NUM_RAYS, w=900.0, x=0.5, y=0.5, z=0.0,
                               kx=500.0, ky=0.0, kz=0.0, dtype=dtype)
    else:
        eq = make_efit(EFIT_FILE, dtype=dtype)
        state = make_ray_state(NUM_RAYS, w=500.0, x=2.5, y=0.0, z=0.0,
                               kx=-500.0, ky=0.0, kz=0.0, dtype=dtype)

    sol = Solver(disp.cold_plasma, eq, method="rk4",
                 dt=1.0 / (NUM_STEPS * SUB_STEPS), sub_steps=SUB_STEPS)

    t0 = time.perf_counter()
    state = init_k(state, disp.cold_plasma, eq, "kx",
                   tolerance=1.0e-10, max_iterations=100)
    jax.block_until_ready(state)
    t_init = time.perf_counter() - t0

    if BENCH_MODE == "grad":
        return run_grad(sol, state, t_init)
    if BENCH_MODE == "absorption":
        return run_absorption_bench(eq, state, t_init)

    # host loop dispatching the jitted 10-substep kernel: measured faster
    # than a scan-fused outer loop on this backend (1.81M vs 1.31M
    # ray-steps/s - the scan adds per-iteration carry copies), and async
    # dispatch keeps the device saturated.
    step = sol.step_fn()
    t0 = time.perf_counter()
    state = step(state)       # compile + first step
    jax.block_until_ready(state)
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(NUM_STEPS - 1):
        state = step(state)
    jax.block_until_ready(state)
    elapsed = time.perf_counter() - t0

    integrator_steps = (NUM_STEPS - 1) * SUB_STEPS
    ray_steps_per_s = NUM_RAYS * integrator_steps / elapsed

    print(json.dumps({
        "metric": f"ray-steps/s/chip (rk4+cold_plasma+{BENCH_EQ.upper()}, "
                  f"{NUM_RAYS} rays f32)",
        "value": round(ray_steps_per_s, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(ray_steps_per_s / BASELINE_RAY_STEPS_PER_S, 4),
    }))
    print(f"# init {t_init:.1f}s  first-step(compile) {t_compile:.1f}s  "
          f"steps {elapsed:.1f}s  final x[0] {float(state.x[0]):.4f}",
          file=sys.stderr)


def run_absorption_bench(eq, state, t_init):
    """Absorption-phase throughput: the split-complex weak-damping kamp
    update (phase 2 of xrays; absorption.hpp:328-484) over the ray
    ensemble, per saved time slice.  Complex-free on TPU by construction
    (models/absorption.make_weak_damping_split)."""
    from graph_framework_tpu.models.absorption import (
        make_weak_damping_split)

    update = jax.jit(make_weak_damping_split(eq))

    # representative damping-region state: inside the plasma (te > 0 so
    # the thermal speed is finite) with a parallel wave-number component
    # (zeta finite).  The launch state sits in the vacuum edge, where weak
    # damping is identically NaN-guarded in the real pipeline.
    state = state._replace(
        x=jnp.full_like(state.x, 2.0),
        kz=jnp.full_like(state.kz, 50.0))

    t0 = time.perf_counter()
    re, im = update(state)
    jax.block_until_ready((re, im))
    t_compile = time.perf_counter() - t0

    slices = max(10, NUM_STEPS)
    t0 = time.perf_counter()
    for _ in range(slices):
        re, im = update(state)
    jax.block_until_ready((re, im))
    elapsed = time.perf_counter() - t0

    updates_per_s = NUM_RAYS * slices / elapsed
    print(json.dumps({
        "metric": f"kamp updates/s/chip (split-complex weak damping, "
                  f"{BENCH_EQ.upper()}, {NUM_RAYS} rays f32)",
        "value": round(updates_per_s, 1),
        "unit": "ray-slices/s",
        "vs_baseline": round(updates_per_s / BASELINE_RAY_STEPS_PER_S, 4),
    }))
    print(f"# init {t_init:.1f}s  compile {t_compile:.1f}s  "
          f"{slices} slices {elapsed:.2f}s  kamp_im[0] {float(im[0]):.3e}",
          file=sys.stderr)


def run_grad(sol, state, t_init):
    """Forward+backward bench: reverse-mode gradient of the trace endpoint
    w.r.t. the full launch state (BASELINE.json north star: profile the
    fused forward+backward step kernel per chip; config 5's reverse-mode
    grads w.r.t. launch params).

    Each recorded step (sub_steps integrator substeps) is wrapped in
    jax.checkpoint so the backward pass rematerializes substates instead of
    storing the NUM_STEPS x SUB_STEPS trajectory (HBM: saves one RayState
    per recorded step only).
    """
    # prevent_cse=False: the checkpointed step sits inside lax.scan, where
    # the CSE-defeating optimization barriers jax.checkpoint inserts by
    # default are documented unnecessary - and they block XLA fusion.
    step = jax.checkpoint(sol.step_fn(), prevent_cse=False)

    def loss(s0):
        def body(s, _):
            return step(s), None
        out, _ = jax.lax.scan(body, s0, None, length=NUM_STEPS)
        # endpoint functional: mean final position/wave-vector magnitude
        return (jnp.sum(out.x) + jnp.sum(out.y) + jnp.sum(out.z)
                + jnp.sum(out.kx)) / out.x.shape[0]

    vg = jax.jit(jax.value_and_grad(loss))

    t0 = time.perf_counter()
    v, g = vg(state)
    jax.block_until_ready(g)
    t_compile = time.perf_counter() - t0

    reps = max(1, int(os.environ.get("BENCH_GRAD_REPS", 3)))
    t0 = time.perf_counter()
    for _ in range(reps):
        v, g = vg(state)
    jax.block_until_ready(g)
    elapsed = (time.perf_counter() - t0) / reps

    ray_steps_per_s = NUM_RAYS * NUM_STEPS * SUB_STEPS / elapsed
    print(json.dumps({
        "metric": f"fwd+bwd ray-steps/s/chip (grad of endpoint w.r.t. "
                  f"launch state, rk4+cold_plasma+{BENCH_EQ.upper()}, "
                  f"{NUM_RAYS} rays f32)",
        "value": round(ray_steps_per_s, 1),
        "unit": "ray-steps/s",
        "vs_baseline": round(ray_steps_per_s / BASELINE_RAY_STEPS_PER_S, 4),
    }))
    print(f"# init {t_init:.1f}s  compile {t_compile:.1f}s  "
          f"fwd+bwd trace {elapsed:.2f}s  loss {float(v):.5f}  "
          f"|dL/dkx0| {float(jnp.abs(g.kx).max()):.3e}", file=sys.stderr)


if __name__ == "__main__":
    main()
