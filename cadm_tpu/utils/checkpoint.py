"""Orbax checkpointing: the reference's ``itr_N.pkl`` snapshots, TPU-native.

Reference behavior (SURVEY.md §5 checkpoint row): joblib pickles of
model+policy per outer iteration, manual resume. Here: Orbax saves of the
full training pytree — dynamics state, env/collector states, history rings,
replay buffer, and the PRNG key — so ``--resume`` reproduces the exact
metrics trajectory of an uninterrupted run (asserted by
tests/test_resume.py). The trainer builds the payload
(MBTrainer.checkpoint_payload) and the matching restore template
(MBTrainer.resume_template); this class only moves pytrees.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp


def _pack_zero_size(tree: Any) -> Any:
    """Replace zero-size leaves with 1-element placeholders.

    Orbax refuses to serialize zero-size arrays, but the training pytree
    legitimately contains them (e.g. ``History.rnn_h`` is zero-width for
    non-recurrent models). The placeholder carries the dtype; the original
    shape is recovered from the restore template in ``_unpack_zero_size``.
    """
    return jax.tree.map(
        lambda x: jnp.zeros((1,), x.dtype) if x.size == 0 else x, tree
    )


def _unpack_zero_size(tree: Any, template: Any) -> Any:
    return jax.tree.map(
        lambda x, t: jnp.zeros(t.shape, t.dtype) if t.size == 0 else x,
        tree, template,
    )


class Checkpointer:
    def __init__(self, directory: str, keep: int = 3, save_buffer: bool = True):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self.save_buffer = save_buffer
        self.mngr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, step: int, state: Any, buffer: Any = None, wait: bool = False) -> None:
        """Save a payload. ``state`` may be a bare model state or a full
        training payload dict (MBTrainer.checkpoint_payload); ``buffer`` is
        kept for back-compat with model-only call sites."""
        if isinstance(state, dict):
            payload = dict(state)
        else:
            payload = {"state": state}
        if buffer is not None and self.save_buffer:
            payload["buffer"] = buffer
        self.mngr.save(
            step, args=self._ocp.args.StandardSave(_pack_zero_size(payload))
        )
        if wait:
            self.mngr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        """Restore the payload at ``step`` (latest if None).

        ``template`` is required: zero-size leaves are saved as shape-(1,)
        placeholders (see ``_pack_zero_size``) and only the template knows
        their true shapes — a template-less restore would silently hand back
        corrupted leaves.
        """
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            return None
        if template is None:
            raise ValueError(
                "Checkpointer.restore needs a template pytree (e.g. "
                "MBTrainer.resume_template()); zero-size leaves are stored "
                "as placeholders whose shapes only the template recovers."
            )
        restored = self.mngr.restore(
            step,
            args=self._ocp.args.StandardRestore(_pack_zero_size(template)),
        )
        return _unpack_zero_size(restored, template)

    @property
    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def close(self) -> None:
        self.mngr.wait_until_finished()
        self.mngr.close()
