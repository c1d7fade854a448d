"""Lane-fused LQR re-solve for the batched stagewise (long-horizon) backend.

The stagewise ADMM's x-update is an LQR re-solve against a fixed Riccati
factorization (`solvers/riccati.py:lqr_resolve`): a backward then a
forward affine sweep of 13-vector recursions.  Batched with `vmap`, XLA
compiles the sweeps into 2*Nt sequential dispatches of tiny matvec
kernels -- launch-overhead-bound at Nt = 240 (measured 607 solves/s at
B = 512).  The associative-scan variant trades that for O(log Nt) levels
of (13, 13) matrix products, which cannot tile onto the 128x128 MXU
(1% utilization) and measures far slower still.

The TPU-native mapping is the same one that won for the condensed QP
(`solvers/lanes_qp.py`): put the SCENARIO BATCH in the 128-wide lane
dimension and keep the horizon sequential -- but inside a Pallas grid, so
the whole sweep is ONE kernel launch with the per-stage factor blocks
(~200 KB each) streamed HBM->VMEM and double-buffered by the pipeline.
The recursion carry (a 13-vector per lane) lives in VMEM scratch across
grid steps; grid = (lane tiles, Nt) iterates stages innermost.

Two kernels per re-solve:
  backward: p_t = F_t' (PC_t + p_{t+1}) + q_t - K_t' r_t,
            k_t = Quu_inv_t (r_t + B_t' (PC_t + p_{t+1}))   (stores k)
  forward:  u_t = -K_t x_t - k_t,   x_{t+1} = F_t x_t + c_t - B_t k_t

Everything is per-lane element math on (13, 13, 128)-class blocks -- pure
VPU work at full lane width.  On non-TPU backends the kernels run in
interpreter mode, so the test suite exercises them on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _bwd_kernel(F_ref, Bm_ref, K_ref, Qi_ref, PC_ref, q_ref, r_ref, qN_ref,
                ks_ref, p_scr):
    """One backward stage for one lane tile; stages iterate reversed."""
    # first executed stage of this tile (t = Nt-1): seed the carry with qN
    @pl.when(pl.program_id(1) == 0)
    def _():
        p_scr[:] = qN_ref[:]

    w = PC_ref[0] + p_scr[:]  # (13, L)
    r = r_ref[0]  # (6, L)
    BtW = jnp.sum(Bm_ref[0] * w[:, None, :], axis=0)  # B' w: (6, L)
    k = jnp.sum(Qi_ref[0] * (r + BtW)[None, :, :], axis=1)  # (6, L)
    ks_ref[0] = k
    FtW = jnp.sum(F_ref[0] * w[:, None, :], axis=0)  # F' w: (13, L)
    KtR = jnp.sum(K_ref[0] * r[:, None, :], axis=0)  # K' r: (13, L)
    p_scr[:] = q_ref[0] + FtW - KtR


def _fwd_kernel(F_ref, Bm_ref, c_ref, K_ref, ks_ref, x0_ref, X_ref, U_ref,
                x_scr):
    """One forward stage for one lane tile; stages iterate in order."""
    @pl.when(pl.program_id(1) == 0)
    def _():
        x_scr[:] = x0_ref[:]

    x = x_scr[:]  # (13, L) = x_t
    k = ks_ref[0]  # (6, L)
    u = -jnp.sum(K_ref[0] * x[None, :, :], axis=1) - k  # (6, L)
    U_ref[0] = u
    Bk = jnp.sum(Bm_ref[0] * k[None, :, :], axis=1)  # (13, L)
    x_next = jnp.sum(F_ref[0] * x[None, :, :], axis=1) + c_ref[0] - Bk
    X_ref[0] = x_next  # stores x_{t+1}
    x_scr[:] = x_next


def _stage_spec(*dims, reverse_nt=None):
    """BlockSpec for a (Nt, ..., B) array: one stage block per grid step."""
    nd = len(dims)
    if reverse_nt is None:
        index = lambda b, t, _nd=nd: (t,) + (0,) * _nd + (b,)
    else:
        index = lambda b, t, _nd=nd, _nt=reverse_nt: (
            (_nt - 1 - t,) + (0,) * _nd + (b,)
        )
    return pl.BlockSpec((1,) + dims + (LANES,), index, memory_space=pltpu.VMEM)


def _tile_spec(*dims):
    """BlockSpec for a stage-free (… , B) array: same block every stage."""
    nd = len(dims)
    return pl.BlockSpec(
        dims + (LANES,),
        lambda b, t, _nd=nd: (0,) * _nd + (b,),
        memory_space=pltpu.VMEM,
    )


def _pad_lanes(x: jnp.ndarray, Bp: int) -> jnp.ndarray:
    """(B, ...) -> (..., Bp): batch to trailing lane axis, zero-padded."""
    x = jnp.moveaxis(x, 0, -1)
    B = x.shape[-1]
    if B == Bp:
        return x
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, Bp - B)])


@jax.jit
def lqr_resolve_lanes(fact, q, r, qN, x0):
    """Batched `lqr_resolve` as two lane-fused Pallas sweeps.

    fact: an `LQRFactorization` whose leaves carry a leading batch axis B
          (as produced by `jax.vmap(lqr_factor)`).
    q:  (B, Nt, n) stage linear state terms      r: (B, Nt, m)
    qN: (B, n)                                   x0: (B, n)
    Returns (X (B, Nt+1, n), U (B, Nt, m)), exactly `vmap(lqr_resolve)`.
    """
    B, Nt, n, m = fact.B.shape
    f32 = jnp.float32
    Bp = -(-B // LANES) * LANES
    grid = (Bp // LANES, Nt)

    # _pad_lanes already yields the kernel layout: (B, Nt, ...) -> (Nt, ..., Bp)
    F_l = _pad_lanes(fact.F.astype(f32), Bp)  # (Nt, n, n, Bp)
    Bm_l = _pad_lanes(fact.B.astype(f32), Bp)  # (Nt, n, m, Bp)
    K_l = _pad_lanes(fact.K.astype(f32), Bp)  # (Nt, m, n, Bp)
    Qi_l = _pad_lanes(fact.Quu_inv.astype(f32), Bp)  # (Nt, m, m, Bp)
    PC_l = _pad_lanes(fact.PC.astype(f32), Bp)  # (Nt, n, Bp)
    c_l = _pad_lanes(fact.c.astype(f32), Bp)  # (Nt, n, Bp)
    q_l = _pad_lanes(q.astype(f32), Bp)  # (Nt, n, Bp)
    r_l = _pad_lanes(r.astype(f32), Bp)  # (Nt, m, Bp)
    qN_l = _pad_lanes(qN.astype(f32), Bp)  # (n,Bp)
    x0_l = _pad_lanes(x0.astype(f32), Bp)  # (n,Bp)

    ks_l = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            _stage_spec(n, n, reverse_nt=Nt),   # F
            _stage_spec(n, m, reverse_nt=Nt),   # B
            _stage_spec(m, n, reverse_nt=Nt),   # K
            _stage_spec(m, m, reverse_nt=Nt),   # Quu_inv
            _stage_spec(n, reverse_nt=Nt),      # PC
            _stage_spec(n, reverse_nt=Nt),      # q
            _stage_spec(m, reverse_nt=Nt),      # r
            _tile_spec(n),                      # qN
        ],
        out_specs=_stage_spec(m, reverse_nt=Nt),
        out_shape=jax.ShapeDtypeStruct((Nt, m, Bp), f32),
        scratch_shapes=[pltpu.VMEM((n, LANES), f32)],
        interpret=_interpret(),
    )(F_l, Bm_l, K_l, Qi_l, PC_l, q_l, r_l, qN_l)

    X_l, U_l = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            _stage_spec(n, n),  # F
            _stage_spec(n, m),  # B
            _stage_spec(n),     # c
            _stage_spec(m, n),  # K
            _stage_spec(m),     # ks
            _tile_spec(n),      # x0
        ],
        out_specs=[_stage_spec(n), _stage_spec(m)],
        out_shape=[
            jax.ShapeDtypeStruct((Nt, n, Bp), f32),
            jax.ShapeDtypeStruct((Nt, m, Bp), f32),
        ],
        scratch_shapes=[pltpu.VMEM((n, LANES), f32)],
        interpret=_interpret(),
    )(F_l, Bm_l, c_l, K_l, ks_l, x0_l)

    dtype = fact.F.dtype
    X_tail = jnp.moveaxis(X_l, -1, 0)[:B].astype(dtype)  # (B, Nt, n) = x_1..x_N
    U = jnp.moveaxis(U_l, -1, 0)[:B].astype(dtype)
    X = jnp.concatenate([x0[:, None, :].astype(dtype), X_tail], axis=1)
    return X, U
