"""Compare remat strategies for the fwd+bwd trace gradient on the chip.

Variants (all EFIT cold-plasma rk4, f32, BENCH_RAYS x BENCH_STEPS x 10):
  fwd        forward-only loss (the 46M/s baseline path)
  remat-step jax.checkpoint around each recorded step (round-1 shipping)
  save-all   checkpoint(policy=everything_saveable): no recompute, all
             residuals stored (only feasible at reduced step counts -
             measures the pure transpose cost)
  remat-sub  checkpoint around each SUBSTEP (finer remat: recompute one
             substep at a time; residual memory per recorded step drops
             10x, recompute count unchanged)
  remat-dots checkpoint(policy=checkpoint_dots)

Run: BENCH_STEPS=100 python tools/bench_grad_variants.py
"""

import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from graph_framework_tpu.models import make_efit, dispersion as disp
from graph_framework_tpu.solver import Solver, make_ray_state, init_k
from graph_framework_tpu.ops.integrators import STEPPERS
from graph_framework_tpu.models.rays import make_ray_rhs

EFIT_FILE = "/root/reference/graph_tests/efit.nc"
N = int(os.environ.get("BENCH_RAYS", 100_000))
STEPS = int(os.environ.get("BENCH_STEPS", 100))
SUB = 10


def main():
    eq = make_efit(EFIT_FILE, dtype=jnp.float32)
    state = make_ray_state(N, w=500.0, x=2.5, y=0.0, z=0.0,
                           kx=-500.0, ky=0.0, kz=0.0, dtype=jnp.float32)
    sol = Solver(disp.cold_plasma, eq, method="rk4",
                 dt=1.0 / (STEPS * SUB), sub_steps=SUB)
    state = init_k(state, disp.cold_plasma, eq, "kx",
                   tolerance=1.0e-10, max_iterations=100)
    jax.block_until_ready(state)

    rhs = make_ray_rhs(disp.cold_plasma, eq)
    dt = sol.dt

    def substep(s):
        return STEPPERS["rk4"](rhs, s, dt)

    def make_step(substep_fn):
        def step(s):
            def body(c, _):
                return substep_fn(c), None
            out, _ = jax.lax.scan(body, s, None, length=SUB)
            return out
        return step

    def make_loss(step):
        def loss(s0):
            def body(s, _):
                return step(s), None
            out, _ = jax.lax.scan(body, s0, None, length=STEPS)
            return (jnp.sum(out.x) + jnp.sum(out.y) + jnp.sum(out.z)
                    + jnp.sum(out.kx)) / out.x.shape[0]
        return loss

    def make_chunked_loss(substep_fn, steps, chunk=100):
        assert steps % chunk == 0
        step = jax.checkpoint(
            make_step(jax.checkpoint(substep_fn, prevent_cse=False)),
            prevent_cse=False)

        def chunk_fn(s):
            def body(c, _):
                return step(c), None
            out, _ = jax.lax.scan(body, s, None, length=chunk)
            return out

        cfn = jax.checkpoint(chunk_fn, prevent_cse=False)

        def loss(s0):
            def body(c, _):
                return cfn(c), None
            out, _ = jax.lax.scan(body, s0, None, length=steps // chunk)
            return (jnp.sum(out.x) + jnp.sum(out.y) + jnp.sum(out.z)
                    + jnp.sum(out.kx)) / out.x.shape[0]
        return loss

    pol = jax.checkpoint_policies
    variants = {
        "fwd": ("fwd", jax.jit(make_loss(make_step(substep)))),
        "remat-step": ("vg", jax.jit(jax.value_and_grad(make_loss(
            jax.checkpoint(make_step(substep), prevent_cse=False))))),
        "remat-sub": ("vg", jax.jit(jax.value_and_grad(make_loss(
            make_step(jax.checkpoint(substep, prevent_cse=False)))))),
        # nested: outer checkpoint bounds residual memory to one RayState
        # per recorded step; inner substep checkpoints keep the per-step
        # backward at remat-sub cost (one extra forward per step total)
        "remat-nested": ("vg", jax.jit(jax.value_and_grad(make_loss(
            jax.checkpoint(
                make_step(jax.checkpoint(substep, prevent_cse=False)),
                prevent_cse=False))))),
        # chunked: STEPS = outer x 100; 3-level checkpoint (chunk, step,
        # substep).  The backend fails outright on a length-1000 scan
        # transpose (remote compile helper crash); two nested scans of
        # length 10 x 100 compile and keep residual memory at one
        # RayState per chunk + per step-in-chunk.
        "remat-chunked": ("vg", jax.jit(jax.value_and_grad(
            make_chunked_loss(substep, STEPS)))),
        "remat-dots": ("vg", jax.jit(jax.value_and_grad(make_loss(
            jax.checkpoint(make_step(substep), prevent_cse=False,
                           policy=pol.checkpoint_dots))))),
        "save-all": ("vg", jax.jit(jax.value_and_grad(make_loss(
            jax.checkpoint(make_step(substep), prevent_cse=False,
                           policy=pol.everything_saveable))))),
    }

    only = os.environ.get("BENCH_VARIANTS")
    if only:
        keep = only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    reps = int(os.environ.get("BENCH_GRAD_REPS", 3))
    for name, (kind, fn) in variants.items():
        try:
            t0 = time.perf_counter()
            out = fn(state)
            jax.block_until_ready(out)
            t_compile = time.perf_counter() - t0
            states = [state._replace(t=state.t + jnp.float32(1e-6 * i))
                      for i in range(reps)]
            t0 = time.perf_counter()
            outs = [fn(s) for s in states]
            jax.block_until_ready(outs)
            dtm = (time.perf_counter() - t0) / reps
            rsps = N * STEPS * SUB / dtm
            print(f"{name:12s} {dtm:8.3f} s  {rsps / 1e6:8.2f} M "
                  f"ray-steps/s  (compile {t_compile:.0f}s)", flush=True)
        except Exception as e:  # OOM etc.
            print(f"{name:12s} FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
