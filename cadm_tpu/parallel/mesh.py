"""Device-mesh / sharding utilities for multi-chip scaling over ICI.

The reference has NO distributed backend (SURVEY.md §2.3: single TF1 process,
multiprocessing env workers only). The TPU-native story replaces all of it
with SPMD over a ``jax.sharding.Mesh``:

- ``dp``    — env-batch data parallelism: env states, history rings and the
  replay buffer are sharded on their leading env axis; collect needs ZERO
  communication (each chip steps its own envs, planner included).
- ``model`` — ensemble-member parallelism: the member axis of the stacked
  forward/backward heads and of bootstrap minibatches is sharded; shared
  encoder gradients are combined by XLA with an all-reduce over ICI.

Computation follows data: we place the initial carriers with NamedShardings
and let XLA propagate/partition inside the jitted collect/fit programs
(the scaling-book recipe — annotate, compile, let XLA insert collectives).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cadm_tpu.core.types import PyTree


def make_mesh(
    dp: Optional[int] = None, model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (dp, model) mesh; dp defaults to n_devices // model."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // model
    assert dp * model == len(devices), (dp, model, len(devices))
    arr = np.asarray(devices).reshape(dp, model)
    return Mesh(arr, ("dp", "model"))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis env sharding over the dp axis."""
    return NamedSharding(mesh, P("dp"))


def member_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis ensemble-member sharding over the model axis."""
    return NamedSharding(mesh, P("model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree: PyTree, sharding: NamedSharding) -> PyTree:
    """device_put array leaves with the leading-axis sharding.

    Scalars (and leaves whose leading axis can't divide the mesh axis) are
    replicated instead — e.g. the replay buffer's ptr/size counters.
    """
    mesh = sharding.mesh
    axis = sharding.spec[0]
    n = mesh.shape[axis]
    rep = NamedSharding(mesh, P())

    def place(x):
        x = jax.numpy.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def sharded_env_step(env, mesh: Optional[Mesh], n_envs: int, mode: int = 0):
    """A vmapped ``env.step`` that runs PER-SHARD under shard_map over 'dp'.

    The physics kernel dispatch (cadm_tpu.physics.rigid.dynamics) selects
    the Pallas kernels via a custom_vmap rule; XLA's SPMD partitioner cannot
    split a custom call, so under a dp-sharded env batch the kernels must be
    invoked per shard. shard_map gives each shard its local env block, the
    vmap inside sees a plain batch, and the kernel branch lowers exactly as
    on one chip — zero collectives (collect is embarrassingly parallel).

    Falls back to a plain vmap when there is no mesh or the batch does not
    divide the dp axis (tiny eval batches).
    """

    def f(states, actions):
        return jax.vmap(lambda s, a: env.step(s, a, mode))(states, actions)

    if mesh is None or n_envs % mesh.shape["dp"] != 0:
        f.is_sharded = False
        return f
    from jax.experimental.shard_map import shard_map

    wrapped = shard_map(
        f,
        mesh=mesh,
        in_specs=(P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp"), P("dp"), P("dp")),
        check_rep=False,
    )
    wrapped.is_sharded = True
    return wrapped


def shard_dynamics_state(state, mesh: Mesh):
    """Replicate a DynamicsState except the member-stacked heads (model axis).

    The encoder and logvar bounds are replicated; ``fwd``/``bwd`` member
    stacks (and their Adam moments) are sharded over the model axis.
    """
    rep = replicated(mesh)
    mem = member_sharding(mesh)

    def place_params(p):
        out = {}
        for k, v in p.items():
            if k in ("fwd", "bwd"):
                out[k] = jax.tree.map(lambda x: jax.device_put(x, mem), v)
            else:
                out[k] = jax.tree.map(lambda x: jax.device_put(x, rep), v)
        return out

    import dataclasses

    params = place_params(state.params)
    # mirror the placement onto the optimizer state (same tree structure
    # inside the Adam moments)
    def place_opt(opt_state):
        def place_like(moment_tree):
            return place_params(moment_tree)

        new = []
        for s in opt_state:
            if hasattr(s, "mu") and hasattr(s, "nu"):
                new.append(
                    s._replace(mu=place_like(s.mu), nu=place_like(s.nu))
                )
            else:
                new.append(jax.tree.map(lambda x: jax.device_put(x, rep), s))
        return tuple(new)

    return dataclasses.replace(
        state,
        params=params,
        opt_state=place_opt(state.opt_state),
        norm=jax.tree.map(lambda x: jax.device_put(x, rep), state.norm),
        updates=jax.device_put(state.updates, rep),
    )
