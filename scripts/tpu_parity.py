"""Run the PRODUCTION Pallas kernels on real TPU and check parity against
the composed pure-JAX paths, for ALL four rigid families (ADVICE r1 #1).

The CPU suite covers hopper/cheetah in Pallas interpret mode (ant/humanoid
under `-m slow` — the interpret-mode XLA compile is minutes for big nv); this
script is the hardware-grade check: the ACTUAL compiled kernels, not the
interpreter. Run on a TPU host:

  python scripts/tpu_parity.py          # all assets + PGS
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from cadm_tpu.envs.rigid_base import load_system
from cadm_tpu.ops.fk_kernel import FULL_DYN_MAX_NV, full_dyn_pallas
from cadm_tpu.ops.pgs import pgs_solve
from tests.test_fused_parity import _pure_smooth, _reference_pgs, _state

ASSETS = ["hopper.xml", "half_cheetah.xml", "ant.xml", "slim_humanoid.xml"]


def check_full_dyn(asset: str, n: int = 64) -> None:
    sys_ = load_system(asset)
    if sys_.nv > FULL_DYN_MAX_NV:
        print(f"SKIP {asset}: nv={sys_.nv} beyond kernel limit")
        return
    qpos, qvel, ctrl, ms, ds, am = _state(sys_, n=n)
    d = full_dyn_pallas(sys_, qpos, qvel, ctrl, ms, ds, am)
    # the XLA reference path runs its einsums on the MXU, whose default
    # precision is bf16-ish — force highest so the reference is the
    # trustworthy side, and compare RELATIVELY (Minv entries reach O(1e2),
    # inverse-mass scale of the light bodies)
    with jax.default_matmul_precision("highest"):
        Minv_ref, v_ref = jax.vmap(lambda *a: _pure_smooth(sys_, *a))(
            qpos, qvel, ctrl, ms, ds, am
        )
    scale_m = float(jnp.abs(Minv_ref).max())
    scale_v = float(jnp.abs(v_ref).max()) + 1.0
    minv_err = float(jnp.abs(d["minv"] - Minv_ref).max()) / scale_m
    v_err = float(jnp.abs(d["v_pred"][..., 0] - v_ref).max()) / scale_v
    assert minv_err < 1e-3, f"{asset} Minv rel err {minv_err}"
    assert v_err < 1e-3, f"{asset} v_pred rel err {v_err}"
    print(f"OK {asset}: rel|dMinv|={minv_err:.2e} rel|dv|={v_err:.2e}")


def check_pgs(nc: int, iters: int = 12, e: int = 16) -> None:
    rng = np.random.RandomState(1)
    G = rng.randn(e, 3 * nc, 3 * nc)
    A = G @ np.transpose(G, (0, 2, 1)) / (3 * nc) + 0.5 * np.eye(3 * nc)
    b = rng.randn(e, 3 * nc)
    v_star = np.abs(rng.randn(e, nc))
    active_mu = rng.choice([0.0, 0.5, 1.0], size=(e, nc))
    lam_k = np.asarray(
        pgs_solve(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(v_star),
            jnp.asarray(active_mu), nc=nc, iters=iters,
        )
    )
    lam_ref = np.stack(
        [_reference_pgs(A[i], b[i], v_star[i], active_mu[i], nc, iters)
         for i in range(e)]
    )
    err = np.abs(lam_k - lam_ref).max()
    assert err < 1e-3, f"pgs nc={nc} err {err}"
    print(f"OK pgs nc={nc}: |dlam|={err:.2e}")


def main() -> None:
    print("device:", jax.devices()[0])
    for asset in ASSETS:
        check_full_dyn(asset)
    for nc in (4, 6, 29):
        check_pgs(nc)
    print("ALL TPU KERNEL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
