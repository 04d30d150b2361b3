"""Result-matrix runner: six families × {Vanilla, Vanilla+CaDM, PE-TS+CaDM}
× {train, moderate, extreme} × seeds (VERDICT r1 item 2).

Runs cells sequentially (the tunneled TPU is a single chip that serializes
across processes) and writes one JSON per cell into ``results/raw/``.
Resume-safe: cells whose JSON already exists are skipped, so the runner can
be stopped and relaunched at any time. ``scripts/make_results.py`` renders
``RESULTS.md`` from the raw cells.

Usage:
  python scripts/run_matrix.py                  # everything not yet done
  python scripts/run_matrix.py --families half_cheetah --models cadm --seeds 0
  python scripts/run_matrix.py --list           # show the planned cells
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import signal
import subprocess
import sys
import time
import traceback

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
# running as `python scripts/run_matrix.py` puts scripts/ (not the repo
# root) on sys.path — add the root so cadm_tpu imports without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "raw")

# buffer_capacity must be >= n_itr * steps_per_itr for every family: the
# reference's dataset grows across iterations and never evicts; a wrapping
# ring drops the early random-exploration data and the model's coverage
# narrows (round 2: both cheetah pets seeds' final evals dipped ~40% right
# after the 6000-column buffer wrapped at itr 12).
#
# Per-family scales: right-sized from the round-1 validated runs (BASELINE.md
# seed-1 cheetah: ~1.3M env steps, warm-started CEM 256 cand H30 → eval 6574
# in 8.4 min). Wall-clock per cell must stay ~5-12 min so the full
# 6×3×2 matrix fits a round; returns saturate near ~1-2M env steps at these
# model sizes, so bigger env batches only buy planner cost, not returns.
FAMILY_BASE = {
    "cartpole": dict(
        env="cartpole", planner="rs", n_candidates=500, plan_horizon=20,
        history_k=10, future_m=5, n_envs=16, steps_per_itr=210, n_itr=10,
        buffer_capacity=4000, eval_envs=32, fit_protocol="epochs",
    ),
    "pendulum": dict(
        env="pendulum", planner="cem", n_candidates=200, plan_horizon=20,
        n_envs=16, steps_per_itr=210, n_itr=12, buffer_capacity=4000,
        eval_envs=32, warm_start=True, fit_protocol="epochs",
    ),
    "half_cheetah": dict(
        env="half_cheetah", planner="cem", n_candidates=256, plan_horizon=30,
        n_envs=256, steps_per_itr=500, n_itr=16, buffer_capacity=8000,
        batch_size=256, eval_envs=32, warm_start=True, fit_protocol="epochs",
        eval_every=3,
    ),
    # the context families need more encoder training than the others:
    # at 12 itrs CaDM still trailed vanilla (round-1 cheetah CaDM reached
    # 6574 with ~2x the data)
    "cripple_ant": dict(
        env="cripple_ant", planner="cem", n_candidates=256, plan_horizon=30,
        n_envs=256, steps_per_itr=500, n_itr=18, buffer_capacity=9000,
        batch_size=256, eval_envs=32, warm_start=True, fit_protocol="epochs",
        eval_every=3,
    ),
    # hopper + slim_humanoid run the MBBL fixed-horizon protocol the
    # reference env lineage uses (Wang et al. 2019: NO early termination,
    # 1000-step episodes, unconditional alive bonus). Under the gym-style
    # healthy-termination protocol these families fall in ~25-64 steps and
    # every model variant flatlines at ~100-170 return regardless of model
    # quality (rounds 2-3) — the paper's hopper/humanoid return scale is
    # only reachable with full-length episodes.
    "slim_humanoid": dict(
        env="slim_humanoid", planner="cem", n_candidates=256, plan_horizon=30,
        n_envs=256, steps_per_itr=500, n_itr=12, buffer_capacity=6000,
        batch_size=256, eval_envs=32, warm_start=True, fit_protocol="epochs",
        eval_every=4, max_parallel_rollouts=32768,
        terminate_unhealthy=False, env_horizon=1000,
    ),
    "hopper": dict(
        env="hopper", planner="cem", n_candidates=256, plan_horizon=30,
        n_envs=256, steps_per_itr=500, n_itr=16, buffer_capacity=8000,
        batch_size=256, eval_envs=32, warm_start=True, fit_protocol="epochs",
        eval_every=4, terminate_unhealthy=False, env_horizon=1000,
    ),
    # bonus family (the paper's six are above; plain Ant is the mass/damping
    # variant of CrippleAnt)
    "ant": dict(
        env="ant", planner="cem", n_candidates=256, plan_horizon=30,
        n_envs=256, steps_per_itr=500, n_itr=12, buffer_capacity=6000,
        batch_size=256, eval_envs=32, warm_start=True, fit_protocol="epochs",
        eval_every=3,
    ),
}

MODEL_VARIANTS = {
    "vanilla": dict(model="vanilla", ensemble=1),
    "cadm": dict(model="cadm", ensemble=1),
    # ensemble rows halve the parallel-row budget: TS1's per-step
    # permutation gathers shifted the libtpu row-fault threshold below the
    # 65520 rows that plain rollouts tolerated (cheetah pets_cadm crash-
    # looped 'TPU worker process crashed' at 252 envs x 260 rows)
    "pets": dict(model="vanilla", ensemble=5, max_parallel_rollouts=32768),
    "pets_cadm": dict(model="cadm", ensemble=5, max_parallel_rollouts=32768),
    # A/B on the early-stop signal for probabilistic members (r5): under
    # the decoupled loss the NLL term dominates the total valid loss, so
    # "loss"-gated early stop quits while the planner-visible means are
    # still improving (cheetah pets_cadm degraded 3688 -> ~1000-2400 as
    # epochs_run fell to 3 and valid fwd MSE rose 0.024 -> 0.054). These
    # variants gate on the forward-mean MSE instead; _mse16 also doubles
    # the epoch cap (weak #8: the cap binds most healthy iterations).
    "pets_cadm_mse": dict(
        model="cadm", ensemble=5, max_parallel_rollouts=32768,
        early_stop_metric="fwd_mse",
    ),
    "pets_cadm_mse16": dict(
        model="cadm", ensemble=5, max_parallel_rollouts=32768,
        early_stop_metric="fwd_mse", max_epochs=16,
    ),
    # trunk-detached variance head (r5): if the _mse gate alone does not
    # stop the mid-run degradation, the remaining mechanism is NLL
    # gradients reaching the shared trunk through the logvar columns - this
    # variant blocks that path entirely (DynamicsConfig.detach_logvar_trunk)
    "pets_cadm_dv": dict(
        model="cadm", ensemble=5, max_parallel_rollouts=32768,
        early_stop_metric="fwd_mse", detach_logvar_trunk=True,
    ),
    # the same two fixes for the no-context PE-TS baseline (cheetah s1
    # collapsed to 365/175/102 under the stock loss-gated protocol)
    "pets_mse": dict(
        model="vanilla", ensemble=5, max_parallel_rollouts=32768,
        early_stop_metric="fwd_mse",
    ),
    "pets_dv": dict(
        model="vanilla", ensemble=5, max_parallel_rollouts=32768,
        early_stop_metric="fwd_mse", detach_logvar_trunk=True,
    ),
    # leg-symmetry train-batch augmentation (r5): CrippleAnt only — makes
    # the held-out crippled leg in-distribution for encoder/dynamics
    # training via the env's exact 4-fold relabeling symmetry
    # (tests/test_ant_symmetry.py; notebooks/cripple_ant_context_probe.md)
    "cadm_aug": dict(model="cadm", ensemble=1, symmetry_aug=True),
    "pets_cadm_aug": dict(
        model="cadm", ensemble=5, max_parallel_rollouts=32768,
        symmetry_aug=True,
    ),
    # baseline rows (paper Fig.3-5 comparisons); run on selected families:
    #   python scripts/run_matrix.py --families half_cheetah hopper \
    #          --models grbal rebal stacked --seeds 0
    "stacked": dict(model="stacked", ensemble=1),
    "rebal": dict(model="rnn", ensemble=1),
    "grbal": dict(model="grbal", ensemble=1),
    # model-free rows (paper §4.3): PPO on raw obs vs PPO+CaDM on
    # concat(obs, z); variant keys override the family planner knobs
    "ppo": dict(
        trainer="ppo", model="vanilla", ensemble=1, n_envs=128,
        rollout_len=256, n_itr=60, model_updates_per_itr=200,
        batch_size=256, buffer_capacity=4096, eval_envs=32,
    ),
    "ppo_cadm": dict(
        trainer="ppo", model="cadm", ensemble=1, n_envs=128,
        rollout_len=256, n_itr=60, model_updates_per_itr=200,
        batch_size=256, buffer_capacity=4096, eval_envs=32,
    ),
}

DEFAULT_FAMILIES = [
    "cartpole", "pendulum", "half_cheetah", "cripple_ant",
    "slim_humanoid", "hopper",
]


def cell_name(family: str, model: str, seed: int) -> str:
    return f"{family}__{model}__s{seed}"


PROBE_PATH = os.path.join(
    os.path.dirname(__file__), "..", "results", "row_fault_probe.json"
)
CKPT_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "ckpt")


def probed_budget(family: str, model: str):
    """Measured per-cell row budget from scripts/probe_rows.py, if any.

    Replaces the guessed 65536/32768 constants (VERDICT r3 weak #7) with
    the empirically bisected safe envs-per-chunk × rows-per-env product."""
    if not os.path.exists(PROBE_PATH):
        return None
    with open(PROBE_PATH) as f:
        probes = json.load(f)
    keys = [f"{family}:{model}"]
    # Ensemble variants (pets_cadm_dv/_aug/_mse...) share pets_cadm's fault
    # mechanism — the chunked TS1 planner path at the family's row count —
    # which loss/head knobs don't change, so they inherit its probed budget
    # (r5i: slim_humanoid pets_cadm_dv crashed twice on the 32768 chunked
    # path the pets_cadm probe had already bisected as faulting).
    if MODEL_VARIANTS.get(model, {}).get("ensemble", 1) > 1:
        keys.append(f"{family}:pets_cadm")
    for key in keys:
        res = probes.get(key)
        if res and res.get("max_safe_rows", 0) > 0:
            return int(res["max_safe_rows"])
    return None


def code_version() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def run_cell(family: str, model: str, seed: int):
    import jax

    from cadm_tpu.cli.presets import ExperimentConfig
    from cadm_tpu.models.dynamics import LOSS_VARIANT

    kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}
    probed = probed_budget(family, model)
    if probed is not None:
        # The measured budget OVERRIDES the variant's guess (round-4 took
        # min() of the two, which forced slim_humanoid pets_cadm down the
        # chunked lax.map planner path the probe never exercised — the full
        # 66560-row single block had PASSED the probe while the chunked
        # 32768 cell crashed the backend 3x).
        kwargs["max_parallel_rollouts"] = probed
        print(f"[matrix] probed row budget: {kwargs['max_parallel_rollouts']}",
              flush=True)
    cfg = ExperimentConfig(**kwargs, seed=seed, eval_modes=(0, 1, 2))
    env, dyn, planner, trainer = cfg.build()
    t0 = time.time()
    # MBTrainer returns (dyn_state, history); PPOTrainer returns
    # (ppo_state, dyn_state, history) — unpack tail-first for both
    out = trainer.train(jax.random.key(seed))
    dyn_state, history = out[-2], out[-1]
    wall = time.time() - t0
    return {
        "family": family,
        "model": model,
        "seed": seed,
        "config": dataclasses.asdict(cfg),
        "code_version": code_version(),
        "loss_variant": LOSS_VARIANT,
        "wall_clock_s": wall,
        "history": history,
    }, dyn_state


def save_snapshot(name: str, dyn_state) -> None:
    """Pickle the final DynamicsState as a numpy pytree.

    Feeds scripts/probe_context.py (paper §5.3 probing analysis: linearly
    decode the hidden dynamics params from z on trained encoders) without
    the Orbax template dance — this is analysis state, not resume state."""
    import pickle

    import jax
    import numpy as np

    os.makedirs(CKPT_DIR, exist_ok=True)
    snap = jax.tree.map(np.asarray, dyn_state)
    with open(os.path.join(CKPT_DIR, name + ".pkl"), "wb") as f:
        pickle.dump(snap, f)


# Path of the in-flight cell's .attempts file, for the SIGTERM trap below.
_CURRENT_ATTEMPT = {"path": None, "before": 0}


def _on_sigterm(signum, frame):
    """External kill (matrix_loop timeout, round-end cut) reaching a
    RESPONSIVE interpreter: a genuinely wedged backend blocks in a C call
    and never delivers the signal, so if we get here the in-flight cell was
    healthy — restore its pre-start attempt count instead of charging a
    start toward the 3-strikes .crashed budget (round-4 weak #7: a
    round-end cut left half_cheetah__pets__s0 with a stale .attempts)."""
    path = _CURRENT_ATTEMPT["path"]
    if path and os.path.exists(path):
        before = _CURRENT_ATTEMPT["before"]
        if before <= 0:
            os.remove(path)
        else:
            with open(path, "w") as f:
                f.write(str(before))
        print("[matrix] SIGTERM while healthy; restored attempt counter",
              flush=True)
    raise SystemExit(143)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=DEFAULT_FAMILIES)
    # default = the paper's primary comparison; baseline rows (stacked/
    # rebal/grbal) are opt-in via --models
    ap.add_argument(
        "--models", nargs="*", default=["vanilla", "cadm", "pets_cadm"]
    )
    ap.add_argument("--seeds", nargs="*", type=int, default=[0, 1])
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    signal.signal(signal.SIGTERM, _on_sigterm)
    os.makedirs(RESULTS_DIR, exist_ok=True)
    # seed-major order: one full family×model sweep completes per seed, so a
    # partial run still yields full matrix coverage at 1 seed
    cells = [
        (f, m, s)
        for s in args.seeds
        for f in args.families
        for m in args.models
    ]
    if args.list:
        for c in cells:
            done = os.path.exists(
                os.path.join(RESULTS_DIR, cell_name(*c) + ".json")
            )
            print(("DONE " if done else "todo ") + cell_name(*c))
        return

    for family, model, seed in cells:
        path = os.path.join(RESULTS_DIR, cell_name(family, model, seed) + ".json")
        fail_path = path.replace(".json", ".failed")
        if os.path.exists(path):
            print(f"[matrix] skip (done): {cell_name(family, model, seed)}", flush=True)
            continue
        if os.path.exists(fail_path):
            print(f"[matrix] skip (failed earlier): {cell_name(family, model, seed)}", flush=True)
            continue
        crash_path = path.replace(".json", ".crashed")
        if os.path.exists(crash_path):
            print(f"[matrix] skip (crashed/hung earlier): {cell_name(family, model, seed)}", flush=True)
            continue
        # Start-attempt counter: covers BOTH backend crashes (process exits
        # 17, relaunched by matrix_loop.sh) and backend hangs (process
        # killed by matrix_loop's `timeout`, leaving no exception at all —
        # the round-3 failure mode that lost an evening). A cell that
        # STARTS 3 times without ever writing its .json or .failed is
        # marked .crashed and skipped forever.
        attempt_path = path.replace(".json", ".attempts")
        attempts = 0
        if os.path.exists(attempt_path):
            with open(attempt_path) as f:
                attempts = int(f.read().strip() or "0")
        if attempts >= 3:
            with open(crash_path, "w") as f:
                f.write(f"started {attempts}x, never finished (crash or hang)\n")
            os.remove(attempt_path)
            print(
                f"[matrix] cell started {attempts}x without finishing; "
                f"marking .crashed and skipping from now on", flush=True,
            )
            continue
        with open(attempt_path, "w") as f:
            f.write(str(attempts + 1))
        _CURRENT_ATTEMPT["path"] = attempt_path
        _CURRENT_ATTEMPT["before"] = attempts
        print(f"[matrix] run: {cell_name(family, model, seed)} "
              f"(start attempt {attempts + 1})", flush=True)
        try:
            result, dyn_state = run_cell(family, model, seed)
        except Exception:
            _CURRENT_ATTEMPT["path"] = None
            tb = traceback.format_exc()
            print(f"[matrix] FAILED: {cell_name(family, model, seed)}", flush=True)
            traceback.print_exc()
            if "UNAVAILABLE" in tb or "worker process crashed" in tb:
                # the backend died; a fresh process must reconnect (the
                # .attempts counter persists and bounds the retries)
                print("[matrix] backend crashed; exiting for restart", flush=True)
                raise SystemExit(17)
            with open(fail_path, "w") as f:
                f.write(tb)
            os.remove(attempt_path)
            continue
        _CURRENT_ATTEMPT["path"] = None
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(result, f)
        os.replace(tmp, path)
        try:
            save_snapshot(cell_name(family, model, seed), dyn_state)
        except Exception:
            traceback.print_exc()  # snapshots are best-effort analysis state
        if os.path.exists(attempt_path):
            os.remove(attempt_path)
        last = result["history"][-1]
        print(
            f"[matrix] done in {result['wall_clock_s']:.0f}s: "
            f"train={last.get('eval/return_mode0'):.1f} "
            f"mod={last.get('eval/return_mode1'):.1f} "
            f"ext={last.get('eval/return_mode2'):.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
