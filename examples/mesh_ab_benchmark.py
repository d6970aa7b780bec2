"""What does `use_mesh` cost on a real chip? (VERDICT r3 item 1a)

The mesh path (Experiment.use_mesh) is correctness-proven on the virtual
8-device CPU mesh (tests/test_parallel.py: fused+sharded+stacked equivalence
+ the compiled-HLO collective-structure assertion), but until round 4 no
number measured what the sharding annotations themselves cost on hardware.
This script A/Bs the SAME fused single-dispatch baseline cycle (7 models,
generation + epochs + pair-stacking, experiments/base.py) meshless vs jitted
over a 1-device `make_mesh(data=1, model=1)` — the largest mesh one chip can
carry. On one device every `with_sharding_constraint` / in/out-sharding is a
no-op layout-wise, so any delta is pure partitioner/annotation overhead; an
8-chip run adds exactly one gradient all-reduce per DP arm per step on top
(pinned by test_compiled_collective_structure — no other collectives exist
in the program).

Timing protocol (CLAUDE.md): donated-state programs through the axon tunnel
must sync on a freshly computed scalar (param checksum) before AND after the
timed loop — `block_until_ready` on donated outputs returns early (fake
9-27 ms/cycle readings measured twice for ~330 ms programs).

Run: python examples/mesh_ab_benchmark.py [--cycles 10] [--out results/mesh_ab]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cycles", type=int, default=10, help="timed cycles per point (batch >= 16 uses 2x: sub-100 ms cycles need a longer probe, RESULTS.md)")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch-sizes", default="1,16")
    ap.add_argument("--out", default="results/mesh_ab")
    args = ap.parse_args()

    from moleculardiffusion_mivit_tpu.experiments import get_experiment
    from moleculardiffusion_mivit_tpu.parallel import make_mesh

    checksum = jax.jit(
        lambda states: sum(
            jnp.sum(x) for x in jax.tree.leaves(states) if jnp.issubdtype(x.dtype, jnp.floating)
        )
    )

    def build(mesh):
        exp = get_experiment("baseline")
        if mesh is not None:
            exp.use_mesh(mesh)
        exp.precompile_schedule = False  # one regime at a time; keep timing clean
        exp.build(jax.random.key(0))
        return exp

    def time_cycles(exp, batch_size: int, cycles: int) -> float:
        fused = exp._fused_cycle_fn()
        key = jax.random.key(123)
        lr = jnp.float32(exp.train_cfg.lr)

        def one(i):
            kg, kt = jax.random.split(jax.random.fold_in(key, i))
            exp.states = fused(exp.states, kg, kt, lr, batch_size)

        for w in range(args.warmup):
            one(2**20 + w)
        float(checksum(exp.states))  # sync (and compile the checksum) before timing
        t0 = time.perf_counter()
        for c in range(cycles):
            one(c)
        float(checksum(exp.states))  # sync on a fresh scalar, not donated buffers
        return (time.perf_counter() - t0) / cycles

    n_seq = None
    report = {"device": str(jax.devices()[0]), "arms": {}}
    for arm, mesh in (("meshless", None), ("mesh_1dev", make_mesh(data=1, model=1))):
        exp = build(mesh)
        n_seq = exp.train_cfg.sequences_per_d * len(exp.train_cfg.training_ds)
        rows = {}
        for bs in (int(b) for b in args.batch_sizes.split(",")):
            cycles = args.cycles * (2 if bs >= 16 else 1)
            t = time_cycles(exp, bs, cycles)
            rows[bs] = {
                "cycle_ms": round(t * 1e3, 2),
                "seqs_per_sec": round(n_seq / t, 1),
            }
            print(f"[{arm}] batch {bs}: {t*1e3:.1f} ms/cycle = {n_seq/t:.0f} seq/s", flush=True)
        report["arms"][arm] = rows
        del exp

    for bs in report["arms"]["meshless"]:
        a = report["arms"]["meshless"][bs]["cycle_ms"]
        b = report["arms"]["mesh_1dev"][bs]["cycle_ms"]
        report.setdefault("overhead_pct", {})[bs] = round(100.0 * (b - a) / a, 2)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "mesh_ab.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
