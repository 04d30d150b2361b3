"""Experiment CLI — the reference's run_scripts, consolidated.

Examples:
  python -m cadm_tpu.cli.run --preset cartpole_vanilla_rs
  python -m cadm_tpu.cli.run --env half_cheetah --model cadm --planner cem \
      --n-envs 2048 --n-itr 20 --exp-name cheetah_cadm
  python -m cadm_tpu.cli.run --preset pendulum_cadm_cem --dp 4 --model-par 2

Flags mirror SURVEY.md §5's config row. ``--dp/--model-par`` build a device
mesh (cadm_tpu.parallel) for multi-chip runs.
"""
from __future__ import annotations

import argparse
import dataclasses

import jax

from cadm_tpu.cli.presets import PRESETS, ExperimentConfig
from cadm_tpu.utils.checkpoint import Checkpointer
from cadm_tpu.utils.logger import TabularLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=sorted(PRESETS), default=None)
    p.add_argument("--exp-name", default=None)
    p.add_argument("--log-dir", default="data")
    p.add_argument("--checkpoint", action="store_true")
    p.add_argument(
        "--resume", action="store_true",
        help="restore the latest checkpoint in the experiment dir and continue",
    )
    p.add_argument(
        "--dump-trajs", action="store_true",
        help="stream collected trajectories to the native async sink",
    )
    p.add_argument("--dp", type=int, default=0, help="data-parallel mesh axis")
    p.add_argument("--model-par", type=int, default=1, help="ensemble-member mesh axis")
    # with `from __future__ import annotations` f.type is a STRING —
    # resolve the real types (unwrapping Optional/Tuple) rather than
    # substring-matching the annotation text (ADVICE r3)
    import typing

    hints = typing.get_type_hints(ExperimentConfig)
    for f in dataclasses.fields(ExperimentConfig):
        flag = "--" + f.name.replace("_", "-")
        t = hints[f.name]
        if typing.get_origin(t) in (typing.Union,):  # Optional[X] -> X
            t = next(
                a for a in typing.get_args(t) if a is not type(None)
            )
        if typing.get_origin(t) is tuple:
            elem = typing.get_args(t)[0]
            p.add_argument(
                flag,
                type=lambda s, e=elem: tuple(e(x) for x in s.split(",")),
                default=None,
            )
        elif t is bool:
            p.add_argument(flag, type=lambda s: s.lower() in ("1", "true"), default=None)
        elif t is int:
            p.add_argument(flag, type=int, default=None)
        elif t is float:
            p.add_argument(flag, type=float, default=None)
        else:
            p.add_argument(flag, type=str, default=None)
    return p


def config_from_args(args) -> ExperimentConfig:
    cfg = PRESETS[args.preset] if args.preset else ExperimentConfig()
    overrides = {
        f.name: getattr(args, f.name)
        for f in dataclasses.fields(ExperimentConfig)
        if getattr(args, f.name) is not None
    }
    return dataclasses.replace(cfg, **overrides)


def main(argv=None):
    args = build_parser().parse_args(argv)
    cfg = config_from_args(args)

    mesh = None
    if args.dp:
        from cadm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, model=args.model_par)

    exp_name = args.exp_name or (args.preset or f"{cfg.env}_{cfg.model}_{cfg.planner}")
    logger = TabularLogger(args.log_dir, exp_name)
    logger.save_params(dataclasses.asdict(cfg))
    logger.log(f"devices: {jax.devices()}  mesh: {mesh and dict(mesh.shape)}")

    env, model, planner, trainer = cfg.build(mesh=mesh)
    ckpt = (
        Checkpointer(f"{logger.dir}/checkpoints")
        if (args.checkpoint or args.resume)
        else None
    )
    resume_payload = None
    if args.resume and ckpt is not None and ckpt.latest_step is not None:
        restored = ckpt.restore(template=trainer.resume_template())
        restored["itr"] = ckpt.latest_step
        resume_payload = restored
        logger.log(
            f"resumed full training state from checkpoint step {ckpt.latest_step}"
        )
    sink = None
    if args.dump_trajs and cfg.trainer != "ppo":
        from cadm_tpu.utils.trajsink import TrajectorySink

        if TrajectorySink.available():
            sink = TrajectorySink(f"{logger.dir}/trajectories.bin")
        else:
            logger.log("native trajsink unavailable; --dump-trajs ignored")
    if cfg.trainer == "ppo":
        _, dyn_state, history = trainer.train(
            jax.random.key(cfg.seed), logger=logger, checkpointer=ckpt,
            resume=resume_payload,
        )
    else:
        dyn_state, history = trainer.train(
            jax.random.key(cfg.seed), logger=logger, checkpointer=ckpt,
            traj_sink=sink, resume=resume_payload,
        )
    if sink is not None:
        sink.flush()
        logger.log(
            f"trajectories.bin: {sink.written} records, {sink.dropped} dropped"
        )
        sink.close()
    if ckpt is not None:
        ckpt.close()
    logger.log("done.")
    return history


if __name__ == "__main__":
    main()
