"""Env registry: the six randomized-dynamics families (SURVEY.md §2.1)."""
from cadm_tpu.envs.ant import AntEnv, CrippleAntEnv
from cadm_tpu.envs.base import Env
from cadm_tpu.envs.cartpole import CartPoleEnv
from cadm_tpu.envs.half_cheetah import HalfCheetahEnv
from cadm_tpu.envs.hopper import HopperEnv
from cadm_tpu.envs.pendulum import PendulumEnv
from cadm_tpu.envs.slim_humanoid import SlimHumanoidEnv

ENVS = {
    "cartpole": CartPoleEnv,
    "pendulum": PendulumEnv,
    "half_cheetah": HalfCheetahEnv,
    "hopper": HopperEnv,
    "ant": AntEnv,
    "cripple_ant": CrippleAntEnv,
    "slim_humanoid": SlimHumanoidEnv,
}


def make(name: str, randomization: str = "discrete", **overrides) -> Env:
    """Construct an env family; ``randomization`` = "discrete" (paper
    protocol, default) or "continuous" (round-1 uniform bands). Extra
    keywords (``terminate_unhealthy``, ``horizon``) override family
    defaults — see ``Env.__init__`` for the MBBL fixed-horizon protocol."""
    return ENVS[name](randomization, **overrides)
