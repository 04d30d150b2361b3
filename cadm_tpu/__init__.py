"""cadm_tpu — a TPU-native framework with the capabilities of younggyoseo/CaDM.

Re-designed from scratch for TPU (JAX / XLA / Pallas / pjit), NOT a port:

- ``cadm_tpu.physics``  — pure-JAX physics: analytic ODE tier (CartPole,
  Pendulum) and a generalized-coordinate rigid-body tier (Featherstone
  CRBA/RNEA, plane contacts) replacing MuJoCo.
- ``cadm_tpu.envs``     — the randomized-dynamics control suite: per-episode
  hidden dynamics draws (mass/damping/length/force/crippled-leg), batched
  observation-only reward functions usable on model-predicted states.
- ``cadm_tpu.models``   — dynamics model zoo: vanilla MLP, probabilistic
  ensembles (PETS-style), and the CaDM context encoder with forward+backward
  prediction heads (arXiv:2005.06800 §3).
- ``cadm_tpu.planners`` — random-shooting and CEM MPC as jitted scans through
  the learned model, vmapped over envs × candidates.
- ``cadm_tpu.train``    — fused collect→train loops (model-based trainer and
  PPO+CaDM), on-device replay, Orbax checkpointing.
- ``cadm_tpu.parallel`` — mesh / sharding utilities for multi-chip DP over ICI.
- ``cadm_tpu.ops``      — Pallas TPU kernels for the hot paths.

Reference semantics are documented against the CaDM paper (ICML 2020,
arXiv:2005.06800) and SURVEY.md; the upstream source mount was empty at build
time (see SURVEY.md provenance header), so paper-grade citations are used
throughout instead of file:line.
"""

__version__ = "0.1.0"
