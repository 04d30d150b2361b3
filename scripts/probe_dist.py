"""Distribution-shift probe: score snapshots on random vs planner-driven data.

Round-4 finding chain (notebooks/r4_cpu_minicells.md): the collapsed
``cripple_ant__pets_cadm__s0`` matrix cell's FINAL model is indistinguishable
from the healthy ``cadm__s0`` on random-policy data — 1-step error 1.17x,
30-step open-loop error equal (scripts/probe_hstep.py), zero blowups, modest
member spread. The remaining hypothesis is DATA COVERAGE: the collapsed cell
never collected locomotion data (early CEM degeneracy), so its model has
never seen gait dynamics and the planner cannot find gaits through it — the
classic MBRL exploration collapse, invisible to random-data probes.

Test: generate a planner-driven ("gait") trajectory buffer with a HEALTHY
generator snapshot, plus a random-policy control buffer, then score each
snapshot's 1-step forward-mean error on BOTH buffers in shared units
(per-dim delta-obs std of the corresponding buffer). Coverage story predicts:
equal on random data, collapsed-model much worse on gait data.

Usage:
  python scripts/probe_dist.py --gen-cell cripple_ant__cadm__s0 \
      --eval-cells cripple_ant__cadm__s0 cripple_ant__pets_cadm__s0 \
      --n-envs 8 --steps 300 --candidates 50 --horizon 15
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "results", "dist_probe")


def _load(cell: str):
    from scripts.run_matrix import CKPT_DIR

    with open(os.path.join(CKPT_DIR, cell + ".pkl"), "rb") as f:
        return pickle.load(f)


def _build(cell: str, args):
    from scripts.run_matrix import FAMILY_BASE, MODEL_VARIANTS
    from cadm_tpu.cli.presets import ExperimentConfig

    family, model, seed_s = cell.split("__")
    kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}
    kwargs.update(
        n_envs=args.n_envs, steps_per_itr=args.steps,
        buffer_capacity=2 * args.steps,
        n_candidates=args.candidates, plan_horizon=args.horizon,
    )
    cfg = ExperimentConfig(**kwargs, seed=int(seed_s[1:]))
    return cfg.build()


def score_on_buffer(dyn, dyn_state, buffer, rng, batches: int, batch: int,
                    shared_std: np.ndarray) -> float:
    """Mean 1-step forward error of the ensemble-members' means on segments
    sampled from ``buffer``, in raw delta-obs units / ``shared_std``."""
    import jax
    import jax.numpy as jnp

    c = dyn.cfg
    params, norm = dyn_state.params, dyn_state.norm

    def one(k):
        mb = buffer.sample_segments(
            k, (c.n_members, batch), c.history_k, c.future_m
        )

        def member(fwd_m, seg):
            z = dyn.get_context(
                params, norm, seg.hist_dobs, seg.hist_act, seg.hist_valid
            )
            obs, act = seg.obs[:, 0], seg.act[:, 0]
            pred = dyn.predict(params, norm, fwd_m, obs, act, z, None)
            real = seg.next_obs[:, 0]
            sq = (((pred - real) / shared_std) ** 2).mean(-1)
            w = seg.valid[:, 0] / (seg.valid[:, 0].sum() + 1e-8)
            return jnp.sum(sq * w)

        return jax.vmap(member)(params["fwd"], mb).mean()

    keys = jax.random.split(rng, batches)
    return float(jax.jit(lambda ks: jax.vmap(one)(ks).mean())(keys))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gen-cell", required=True,
                    help="healthy snapshot that drives the gait collection")
    ap.add_argument("--eval-cells", nargs="+", required=True)
    ap.add_argument("--n-envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--candidates", type=int, default=50)
    ap.add_argument("--horizon", type=int, default=15)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--batch", type=int, default=256)
    args = ap.parse_args()

    import jax

    env, gen_dyn, planner, trainer = _build(args.gen_cell, args)
    gen_state = _load(args.gen_cell)

    rng = jax.random.key(11)
    r_init, r_rand, r_gait, r_score = jax.random.split(rng, 4)
    env_states, hists, buf_rand, _ = trainer.init(r_init)

    # random-policy control buffer (also warms the histories the planner
    # conditioning needs)
    env_states, hists, buf_rand, m_rand = trainer._collect(
        r_rand, env_states, hists, buf_rand, gen_state, random_actions=True
    )
    # planner-driven ("gait") buffer: fresh buffer, continued env states
    buf_gait = trainer.init(r_init)[2]
    env_states, hists, buf_gait, m_gait = trainer._collect(
        r_gait, env_states, hists, buf_gait, gen_state, random_actions=False
    )
    print(f"[probe_dist] gait collect mean_step_reward="
          f"{float(m_gait['collect/mean_step_reward']):.3f} "
          f"(random: {float(m_rand['collect/mean_step_reward']):.3f})",
          flush=True)

    buffers = {"random": buf_rand, "gait": buf_gait}
    stds = {}
    for name, buf in buffers.items():
        obs, act, dobs, mask = buf.norm_inputs()
        d = np.asarray(dobs)
        m = np.asarray(mask, bool).reshape(-1)
        stds[name] = d.reshape(-1, d.shape[-1])[m].std(0) + 1e-8

    out = {
        "gen_cell": args.gen_cell, "n_envs": args.n_envs,
        "steps": args.steps,
        "gait_mean_step_reward": round(
            float(m_gait["collect/mean_step_reward"]), 4),
        "random_mean_step_reward": round(
            float(m_rand["collect/mean_step_reward"]), 4),
        "nmse": {},
    }
    for cell in args.eval_cells:
        _, dyn, _, _ = _build(cell, args)
        st = _load(cell)
        out["nmse"][cell] = {
            name: round(
                score_on_buffer(dyn, st, buf, r_score, args.batches,
                                args.batch, stds[name]), 4)
            for name, buf in buffers.items()
        }
        print(f"[probe_dist] {cell}: {out['nmse'][cell]}", flush=True)

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, args.gen_cell + ".json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
