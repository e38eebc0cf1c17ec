"""North-star ladder driver: 1M-ray EFIT trace, full reference duration.

Runs bench.py once per leg (serialized - one TPU process at a time on
this backend) and assembles the BENCH_EFIT1M artifact: plain rk4 ->
frozen rk4 -> frozen rk2 -> frozen rk2 K=10 + compensated (the r4
headline) -> frozen-window Pallas kernel legs (r5).  Endpoint agreement
across legs (final_x0) is part of the artifact: every optimized leg must
land on the plain-rk4 trajectory to f32 resolution.

Usage: python tools/bench_efit1m.py [out.json]
"""

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

LEGS = [
    ("plain_rk4", {"BENCH_SOLVER": "rk4", "BENCH_DTYPES": "f32"}),
    ("frozen_rk4", {"BENCH_SOLVER": "rk4", "BENCH_DTYPES": "f32",
                    "BENCH_FROZEN": "1"}),
    ("frozen_rk2", {"BENCH_SOLVER": "rk2", "BENCH_DTYPES": "f32",
                    "BENCH_FROZEN": "1"}),
    ("frozen_rk2_k10_comp", {"BENCH_SOLVER": "rk2", "BENCH_DTYPES": "f32c",
                             "BENCH_FROZEN": "1",
                             "BENCH_FREEZE_EVERY": "10"}),
    ("pallas_rk2_k10", {"BENCH_SOLVER": "rk2", "BENCH_DTYPES": "f32",
                        "BENCH_FROZEN": "1", "BENCH_FREEZE_EVERY": "10",
                        "BENCH_PALLAS_WINDOW": "1"}),
    ("pallas_rk2_k10_comp", {"BENCH_SOLVER": "rk2", "BENCH_DTYPES": "f32c",
                             "BENCH_FROZEN": "1",
                             "BENCH_FREEZE_EVERY": "10",
                             "BENCH_PALLAS_WINDOW": "1"}),
]


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_EFIT1M_r05.json"
    base = dict(os.environ, BENCH_RAYS="1000000", BENCH_STEPS="1000",
                BENCH_SUB_STEPS="10")
    results = {}
    for name, env in LEGS:
        print(f"== {name} ==", flush=True)
        p = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            env={**base, **env}, capture_output=True, text=True,
            timeout=1800)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")]
        if not line:
            print(p.stdout[-2000:], p.stderr[-2000:], flush=True)
            raise SystemExit(f"leg {name} produced no JSON")
        results[name] = json.loads(line[-1])
        print(json.dumps({k: results[name][k]
                          for k in ("metric", "value")}), flush=True)

    # headline = fastest accuracy-carrying leg (compensated)
    head = results["pallas_rk2_k10_comp"]
    dt_key = next(iter(head["dtypes"]))
    endpoints = {n: r["dtypes"][next(iter(r["dtypes"]))]["final_x0"]
                 for n, r in results.items()}
    artifact = {
        "metric": "ray-steps/s/chip (1M-ray EFIT north-star ladder, "
                  "full 1000x10 duration)",
        "value": head["value"],
        "unit": "ray-steps/s",
        "vs_baseline": head["vs_baseline"],
        "headline_leg": "pallas_rk2_k10_comp "
                        "(frozen-window VMEM-resident kernel, "
                        "compensated double-word f32)",
        "final_x0_by_leg": endpoints,
        "legs": results,
    }
    with open(out_path, "w") as fh:
        json.dump(artifact, fh, indent=1)
    print(f"wrote {out_path}: headline {head['value']:.3g} "
          f"({dt_key})", flush=True)


if __name__ == "__main__":
    main()
