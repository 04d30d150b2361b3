"""Probing analysis: is the hidden dynamics context linearly decodable
from the CaDM latent z? (paper §5.3 / SURVEY.md §4.3; VERDICT r3 item 4.)

Loads a trained-model snapshot written by scripts/run_matrix.py
(results/ckpt/<cell>.pkl), collects fresh on-policy (or random-policy)
windows in the cell's env family, encodes each env's K-window to z, and
fits closed-form linear decoders z -> hidden params:

  - continuous targets (mass_scale, damping_scale, pole length, push
    force...): ridge regression, held-out R² per target.
  - CrippleAnt leg id: one-hot least squares -> argmax, held-out accuracy
    vs chance (1/3 on the train legs).

If z never encodes the crippled-leg id, that — not the planner — explains
CaDM trailing vanilla on cripple_ant's shifted ranges (VERDICT weak #3).

Usage:
  python scripts/probe_context.py --cell cripple_ant__cadm__s0
  python scripts/probe_context.py --cell half_cheetah__cadm__s0 --rounds 3
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import pickle
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = os.path.join(
    os.path.dirname(__file__), "..", "results", "context_probe"
)


def targets_from_params(family: str, params) -> dict:
    """Per-env decode targets (each an (E,) float array) from the hidden
    param pytree the env sampled at reset."""
    p = {f.name: np.asarray(getattr(params, f.name))
         for f in dataclasses.fields(params)}
    if family == "cripple_ant":
        # act_mask (E, nu): recover the crippled leg id from which actuator
        # group is zeroed (envs/ant.py LEG_ACTUATORS)
        from cadm_tpu.envs.ant import LEG_ACTUATORS

        mask = p["act_mask"]
        legs = np.full(mask.shape[0], -1)
        for leg, acts in enumerate(LEG_ACTUATORS):
            zeroed = (mask[:, list(acts)] == 0.0).all(axis=1)
            legs[zeroed] = leg
        return {"crippled_leg": legs.astype(np.float64)}
    return {k: v.astype(np.float64) for k, v in p.items() if v.ndim == 1}


def ridge_r2(z: np.ndarray, y: np.ndarray, lam: float = 1e-3):
    """Held-out R² of a ridge decoder z -> y (half/half split)."""
    n = z.shape[0]
    idx = np.random.RandomState(0).permutation(n)
    tr, te = idx[: n // 2], idx[n // 2:]
    x = np.concatenate([z, np.ones((n, 1))], axis=1)
    a = x[tr].T @ x[tr] + lam * np.eye(x.shape[1])
    w = np.linalg.solve(a, x[tr].T @ y[tr])
    pred = x[te] @ w
    ss_res = ((y[te] - pred) ** 2).sum()
    ss_tot = ((y[te] - y[te].mean()) ** 2).sum() + 1e-12
    return 1.0 - ss_res / ss_tot


def onehot_accuracy(z: np.ndarray, labels: np.ndarray, lam: float = 1e-3):
    """Held-out argmax accuracy of a one-hot least-squares decoder."""
    classes = np.unique(labels)
    y = (labels[:, None] == classes[None, :]).astype(np.float64)
    n = z.shape[0]
    idx = np.random.RandomState(0).permutation(n)
    tr, te = idx[: n // 2], idx[n // 2:]
    x = np.concatenate([z, np.ones((n, 1))], axis=1)
    a = x[tr].T @ x[tr] + lam * np.eye(x.shape[1])
    w = np.linalg.solve(a, x[tr].T @ y[tr])
    pred = classes[np.argmax(x[te] @ w, axis=1)]
    acc = float((pred == labels[te]).mean())
    chance = float(
        max((labels[te] == c).mean() for c in classes)
    )
    return acc, chance, len(classes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cell", required=True,
                    help="e.g. cripple_ant__cadm__s0 (needs results/ckpt/<cell>.pkl)")
    ap.add_argument("--rounds", type=int, default=2,
                    help="collect rounds; samples = rounds * n_envs")
    ap.add_argument("--random-policy", action="store_true",
                    help="collect with random actions instead of the planner")
    ap.add_argument("--mode", type=int, default=0,
                    help="hidden-param range: 0 train / 1 moderate / 2 extreme")
    ap.add_argument("--n-envs", type=int, default=None,
                    help="override the cell's env batch (CPU probing)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override steps_per_itr for the collect rounds")
    ap.add_argument("--save-arrays", action="store_true",
                    help="also save raw (z, targets) to <cell>.npz for "
                         "cross-mode analyses (e.g. where the held-out "
                         "crippled leg embeds relative to the train legs)")
    args = ap.parse_args()

    import jax

    from scripts.run_matrix import CKPT_DIR, FAMILY_BASE, MODEL_VARIANTS
    from cadm_tpu.cli.presets import ExperimentConfig

    family, model, seed_s = args.cell.split("__")
    ckpt_path = os.path.join(CKPT_DIR, args.cell + ".pkl")
    with open(ckpt_path, "rb") as f:
        dyn_state = pickle.load(f)

    kwargs = {**FAMILY_BASE[family], **MODEL_VARIANTS[model]}
    if args.n_envs:
        kwargs["n_envs"] = args.n_envs
    if args.steps:
        kwargs["steps_per_itr"] = args.steps
    cfg = ExperimentConfig(**kwargs, seed=int(seed_s[1:]))
    env, dyn, planner, trainer = cfg.build()

    rng = jax.random.key(1234)
    if args.mode != 0 or args.random_policy:
        # self-contained random-policy collector: supports shifted ranges
        # (mode 1/2 and the held-out crippled leg), mirroring the trainer's
        # push-history + wipe-on-done bookkeeping
        import jax.numpy as jnp

        from cadm_tpu.core.types import batched_history

        n_envs = cfg.n_envs
        t_steps = cfg.steps_per_itr

        @jax.jit
        def collect_mode(rng):
            r_reset, r_run = jax.random.split(rng)
            states = jax.vmap(lambda k: env.reset(k, args.mode))(
                jax.random.split(r_reset, n_envs)
            )
            hists0 = batched_history(dyn.cfg, n_envs)

            def step(carry, k):
                states, hists = carry
                obs = jax.vmap(env.observe)(states.params, states.phys)
                a = jax.random.uniform(
                    k, (n_envs, env.act_dim), minval=-1.0, maxval=1.0
                )
                nstates, nobs, rew, done = jax.vmap(
                    lambda s, aa: env.step(s, aa, args.mode)
                )(states, a)
                hists = dyn.push_history(
                    dyn_state.params, dyn_state.norm, hists,
                    obs, nobs - obs, a,
                )
                hists = jax.tree.map(
                    lambda new: jnp.where(
                        done.reshape((-1,) + (1,) * (new.ndim - 1)),
                        jnp.zeros_like(new), new,
                    ),
                    hists,
                )
                return (nstates, hists), None

            keys = jax.random.split(r_run, t_steps)
            (states, hists), _ = jax.lax.scan(step, (states, hists0), keys)
            return states, hists

        def collect(k, env_states, hists, buffer, dyn_state):
            states, hists = collect_mode(k)
            return states, hists, buffer, None

        env_states = hists = buffer = None
    else:
        env_states, hists, buffer, _ = trainer.init(rng)
        collect = trainer._collect_plan

    zs, tgts = [], None
    for r in range(args.rounds):
        rng, k = jax.random.split(rng)
        env_states, hists, buffer, _ = collect(
            k, env_states, hists, buffer, dyn_state
        )
        z = dyn.context_from_history(dyn_state.params, dyn_state.norm, hists)
        # drop envs whose window straddles a reset (partial valid): the
        # encoder consumes zero-padded slots there and the window mixes no
        # information about the CURRENT episode's params
        full = np.asarray(hists.valid).min(axis=-1) > 0
        zs.append(np.asarray(z, dtype=np.float64)[full])
        t = {
            k2: v[full] for k2, v in
            targets_from_params(family, env_states.params).items()
        }
        tgts = (
            t if tgts is None
            else {k2: np.concatenate([tgts[k2], t[k2]]) for k2 in t}
        )
        print(f"[probe-context] round {r}: {zs[-1].shape[0]} full windows",
              flush=True)
    z = np.concatenate(zs, axis=0)
    out = {"cell": args.cell, "n_windows": int(z.shape[0]),
           "z_dim": int(z.shape[1]), "mode": args.mode, "policy":
           "random" if (args.random_policy or args.mode != 0) else "planner",
           "targets": {}}
    for name, y in tgts.items():
        if name == "crippled_leg":
            acc, chance, k = onehot_accuracy(z, y)
            out["targets"][name] = {
                "decoder": "onehot-lstsq", "held_out_accuracy": acc,
                "majority_chance": chance, "n_classes": k,
            }
        else:
            out["targets"][name] = {
                "decoder": "ridge", "held_out_r2": float(ridge_r2(z, y)),
            }
    os.makedirs(OUT_DIR, exist_ok=True)
    suffix = "" if args.mode == 0 else f"__mode{args.mode}"
    with open(os.path.join(OUT_DIR, args.cell + suffix + ".json"), "w") as f:
        json.dump(out, f, indent=2)
    if args.save_arrays:
        np.savez(
            os.path.join(OUT_DIR, args.cell + suffix + ".npz"),
            z=z, **tgts,
        )
    print(json.dumps(out, indent=2), flush=True)


if __name__ == "__main__":
    main()
