"""Empirically locate the libtpu planner row-fault boundary per family.

Round 2-3 worked around a hard backend fault ("TPU worker process crashed")
by guessing row budgets (65536 for plain rollouts, 32768 for TS1 ensembles —
`planners/mpc.py PlannerConfig.max_parallel_rollouts`). The guesses were
wrong for slim_humanoid PE-TS (45-dim obs, 17-dim act): the round-3 matrix
crash-looped for ~2h on that cell. VERDICT r3 item 1 asks for an empirical
probe: bisect env-chunk sizes on the real chip and record the measured
boundary per (family, variant) into a JSON the matrix configs read from.

Design: each trial runs in a SUBPROCESS (the fault kills the whole backend
connection, so the parent must never touch the TPU). The child builds the
exact matrix-cell stack (ExperimentConfig.build) and runs a short
planner-driven collect — the same jitted program shape that faults at matrix
scale — then forces the result to host. rc=0 → the chunk size is safe.
After a failed trial the parent backs off to let the backend restart.

Usage:
  python scripts/probe_rows.py --probe slim_humanoid:pets_cadm   # bisect one
  python scripts/probe_rows.py                                   # default set
  python scripts/probe_rows.py --child ... (internal)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(
    os.path.dirname(__file__), "..", "results", "row_fault_probe.json"
)
CHILD_TIMEOUT_S = 900
CRASH_BACKOFF_S = 45


def build_cell_kwargs(family: str, model: str) -> dict:
    from scripts.run_matrix import FAMILY_BASE, MODEL_VARIANTS

    return {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}


def child_main(args) -> None:
    """One trial at the given row budget. Phases isolate which jitted
    program faults (the backend crash only surfaces at materialization, so
    matrix tracebacks can't distinguish collect from fit from eval):
      plan    — planner-driven collect scan (args.steps planner calls)
      randfit — random collect (matrix steps_per_itr) + the full ensemble fit
      itr2    — two full training iterations (collect+fit+eval), the real cell
    """
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    from cadm_tpu.cli.presets import ExperimentConfig

    kwargs = build_cell_kwargs(args.family, args.model)
    kwargs["max_parallel_rollouts"] = args.budget
    if args.phase == "plan":
        kwargs["steps_per_itr"] = args.steps
    if args.phase == "itr2":
        kwargs["n_itr"] = 2
        kwargs["eval_every"] = 1
    cfg = ExperimentConfig(**kwargs, seed=0)
    env, dyn, planner, trainer = cfg.build()
    rng = jax.random.key(0)
    if args.phase == "itr2":
        _, history = trainer.train(rng)
        print(f"[probe-child] OK budget={args.budget} phase=itr2 "
              f"last={history[-1]}", flush=True)
        return
    env_states, hists, buffer, dyn_state = trainer.init(rng)
    if args.phase == "randfit":
        env_states, hists, buffer, metrics = trainer._collect_random(
            rng, env_states, hists, buffer, dyn_state
        )
        dyn_state, fit_metrics = trainer._fit(rng, buffer, dyn_state)
        val = float(fit_metrics["fit/valid_loss_after"])
    else:
        _, _, _, metrics = trainer._collect_plan(
            rng, env_states, hists, buffer, dyn_state
        )
        # force device->host (this platform returns at enqueue; the fault
        # only surfaces on materialization)
        val = float(metrics["collect/mean_step_reward"])
    print(
        f"[probe-child] OK budget={args.budget} phase={args.phase} "
        f"val={val:.4f}",
        flush=True,
    )


def backend_healthy(timeout_s: int = 180) -> bool:
    """Pre-flight: a tiny REAL matmul (forced to host) in a subprocess.

    The round-3 diagnose runs were contaminated by exactly this ambiguity:
    with the relay wedged (or the chip held by another process) every trial
    times out and reads as a shape fault. Trials only count when the
    backend answers this first."""
    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((256, 256));"
        "print('OK', float((x @ x).sum()))"
    )
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return False
    return proc.returncode == 0 and "OK" in proc.stdout


def wait_for_backend(max_wait_s: int = 1800) -> bool:
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if backend_healthy():
            return True
        print("[probe] backend unhealthy; waiting 120s", flush=True)
        time.sleep(120)
    return False


def run_trial(
    family: str, model: str, budget: int, steps: int, phase: str = "plan"
) -> bool:
    if not wait_for_backend():
        print("  trial skipped: backend never became healthy", flush=True)
        return False
    cmd = [
        sys.executable, os.path.abspath(__file__), "--child",
        "--family", family, "--model", model, "--phase", phase,
        "--budget", str(budget), "--steps", str(steps),
    ]
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, timeout=CHILD_TIMEOUT_S, capture_output=True, text=True
        )
    except subprocess.TimeoutExpired:
        print(f"  trial budget={budget}: TIMEOUT after {CHILD_TIMEOUT_S}s", flush=True)
        time.sleep(CRASH_BACKOFF_S)
        return False
    ok = proc.returncode == 0
    tail = (proc.stdout + proc.stderr).strip().splitlines()[-1:] or [""]
    print(
        f"  trial phase={phase} budget={budget}: {'PASS' if ok else 'FAIL'} "
        f"({time.time() - t0:.0f}s) {tail[0][:120]}",
        flush=True,
    )
    if not ok:
        time.sleep(CRASH_BACKOFF_S)
    return ok


def rows_per_env(family: str, model: str) -> int:
    kwargs = build_cell_kwargs(family, model)
    members = kwargs.get("ensemble", 1)
    cand = kwargs["n_candidates"]
    return -(-cand // members) * members


def bisect_probe(family: str, model: str, steps: int) -> dict:
    """Bisect the max safe envs-per-chunk for one matrix cell config."""
    kwargs = build_cell_kwargs(family, model)
    n_envs = kwargs["n_envs"]
    rpe = rows_per_env(family, model)
    print(
        f"[probe] {family}:{model} rows/env={rpe} n_envs={n_envs} "
        f"(full block = {n_envs * rpe} rows)",
        flush=True,
    )
    # chunk sizes in envs; budget = chunk * rows/env
    lo, hi = 0, n_envs  # lo = known-pass, hi = known-fail (n_envs+1 if full passes)
    # first try the full batch (maybe nothing is wrong at this shape)
    if run_trial(family, model, n_envs * rpe, steps):
        return {
            "family": family, "model": model, "rows_per_env": rpe,
            "max_safe_envs_per_chunk": n_envs,
            "max_safe_rows": n_envs * rpe, "boundary_found": False,
            "note": "full env batch passed; no fault at this shape",
        }
    hi = n_envs
    # then a small chunk to confirm the fault is size-dependent at all
    small = max(1, n_envs // 8)
    if not run_trial(family, model, small * rpe, steps):
        return {
            "family": family, "model": model, "rows_per_env": rpe,
            "max_safe_envs_per_chunk": 0, "max_safe_rows": 0,
            "boundary_found": False,
            "note": f"even {small} envs/chunk ({small * rpe} rows) faults — "
                    "NOT a row-budget problem; debug the program itself",
        }
    lo = small
    while hi - lo > max(4, n_envs // 32):
        mid = (lo + hi) // 2
        if run_trial(family, model, mid * rpe, steps):
            lo = mid
        else:
            hi = mid
    return {
        "family": family, "model": model, "rows_per_env": rpe,
        "max_safe_envs_per_chunk": lo, "max_safe_rows": lo * rpe,
        "first_failing_envs_per_chunk": hi, "first_failing_rows": hi * rpe,
        "boundary_found": True,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--family", default="slim_humanoid")
    ap.add_argument("--model", default="pets_cadm")
    ap.add_argument("--budget", type=int, default=32768)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--phase", default="plan", choices=["plan", "randfit", "itr2"])
    ap.add_argument(
        "--probe", nargs="*", default=["slim_humanoid:pets_cadm"],
        help="family:model pairs to bisect",
    )
    ap.add_argument(
        "--diagnose", action="store_true",
        help="run plan + randfit phases at --budget to isolate the faulting "
             "program instead of bisecting",
    )
    ap.add_argument(
        "--itr2-budgets", nargs="*", type=int, default=None,
        help="run the REAL 2-iteration cell (collect+fit+eval) at each "
             "budget — the phase that actually reproduces matrix crashes "
             "(phase=plan on fresh state missed the slim_humanoid fault: "
             "the chunked-vs-single-block planner program differs)",
    )
    ap.add_argument(
        "--health", action="store_true",
        help="exit 0 iff the TPU backend answers a tiny real matmul "
             "(used by matrix_loop.sh between relaunches)",
    )
    args = ap.parse_args()
    if args.health:
        ok = backend_healthy()
        print(f"[probe] backend {'healthy' if ok else 'UNHEALTHY'}", flush=True)
        raise SystemExit(0 if ok else 1)
    if args.child:
        child_main(args)
        return

    if args.diagnose:
        out = {}
        for spec in args.probe:
            family, model = spec.split(":")
            out[spec] = {
                phase: run_trial(family, model, args.budget, args.steps, phase)
                for phase in ("plan", "randfit")
            }
        print(f"[probe] diagnose results: {json.dumps(out)}", flush=True)
        return

    if args.itr2_budgets is not None:
        results = {}
        if os.path.exists(OUT_PATH):
            with open(OUT_PATH) as f:
                results = json.load(f)
        for spec in args.probe:
            family, model = spec.split(":")
            trials = {}
            for budget in args.itr2_budgets:
                trials[str(budget)] = run_trial(
                    family, model, budget, args.steps, phase="itr2"
                )
            key = f"{spec}:itr2"
            results[key] = {
                "family": family, "model": model, "phase": "itr2",
                "trials": trials,
            }
            # if exactly the larger single-block budget passes while the
            # chunked one faults, record the passing budget as the cell's
            # measured row budget (run_matrix.probed_budget reads it)
            passing = [int(b) for b, ok in trials.items() if ok]
            if passing:
                results[spec] = {
                    "family": family, "model": model,
                    "rows_per_env": rows_per_env(family, model),
                    "max_safe_rows": max(passing),
                    "boundary_found": True,
                    "note": "itr2 (real-cell) trials: "
                            + json.dumps(trials),
                }
            with open(OUT_PATH, "w") as f:
                json.dump(results, f, indent=2)
        print(f"[probe] wrote {OUT_PATH}", flush=True)
        return

    results = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            results = json.load(f)
    for spec in args.probe:
        family, model = spec.split(":")
        res = bisect_probe(family, model, args.steps)
        print(f"[probe] result: {json.dumps(res)}", flush=True)
        results[spec] = res
        with open(OUT_PATH, "w") as f:
            json.dump(results, f, indent=2)
    print(f"[probe] wrote {OUT_PATH}", flush=True)


if __name__ == "__main__":
    main()
