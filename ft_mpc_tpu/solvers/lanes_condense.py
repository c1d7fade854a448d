"""Lane-batched fused condensing kernel (prediction matrices).

Condensing builds S_t, phi_t with delta_x_t = S_t delta_U + phi_t from the
stage jacobians: S_{t} = A_t S_{t-1} (+ B_t at block t), phi_t = A_t
phi_{t-1} + defect_t (`controllers/spiraling.py:_condense`).  As an XLA
lax.scan this is 15 sequential steps of tiny (13x13)@(13x90) batched
matmuls -- ~12 ms at B=2048 on v5e, almost entirely per-step launch
overhead and HBM round trips of the (B,13,90) carry.

Here the whole recursion runs inside one Pallas kernel with the scenario
batch in the lane dimension: the S carry (13, 90, 128) stays in
VMEM/vregs, each stage is 13 row-contractions of full-width VPU ops, and
the horizon loop is statically unrolled.  ~25 MFLOP per 128-scenario
tile -- pure VPU, no MXU padding losses on the tiny operands.

Reference parity: this is the TPU replacement for CasADi's symbolic
elimination of the shooting states (`ft_mpc/controllers/spiraling_mpc.py:
110-172` keeps states as decision variables and lets IPOPT factor the
KKT; condensing moves that work into a dense 90-var QP instead).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
N_X = 13
N_U = 6


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _condense_kernel(A_ref, B_ref, d_ref, S_out, phi_out):
    Nt = A_ref.shape[0]
    n = Nt * N_U
    f32 = jnp.float32
    S = jnp.zeros((N_X, n, LANES), f32)
    phi = jnp.zeros((N_X, LANES), f32)
    for t in range(Nt):
        A_t = A_ref[t]  # (13, 13, L)
        B_t = B_ref[t]  # (13, 6, L)
        d_t = d_ref[t]  # (13, L)
        S = jnp.stack(
            [jnp.sum(A_t[i][:, None, :] * S, axis=0) for i in range(N_X)],
            axis=0,
        )
        # static-slice concat (".at[...].add" lowers to scatter-add, which
        # Mosaic does not implement; zero-width slices are also rejected)
        parts = []
        if t > 0:
            parts.append(S[:, : N_U * t, :])
        parts.append(S[:, N_U * t : N_U * (t + 1), :] + B_t)
        if t + 1 < Nt:
            parts.append(S[:, N_U * (t + 1) :, :])
        S = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
        phi = (
            jnp.stack(
                [jnp.sum(A_t[i] * phi, axis=0) for i in range(N_X)], axis=0
            )
            + d_t
        )
        S_out[t] = S
        phi_out[t] = phi


def condense_lanes(
    A_stack: jnp.ndarray,  # (B, Nt, 13, 13)
    B_stack: jnp.ndarray,  # (B, Nt, 13, 6)
    defects: jnp.ndarray,  # (B, Nt, 13)
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched prediction matrices: returns (S_all (B,Nt,13,n), phi (B,Nt,13)).

    Semantics match vmap(_condense); fp32.  B is padded to a multiple of
    128 internally.
    """
    B, Nt = A_stack.shape[:2]
    n = Nt * N_U
    dtype = A_stack.dtype
    f32 = jnp.float32
    Bp = -(-B // LANES) * LANES

    def pad(x):
        if B == Bp:
            return x
        return jnp.pad(x, [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1))

    A_l = jnp.moveaxis(pad(A_stack.astype(f32)), 0, -1)  # (Nt,13,13,Bp)
    B_l = jnp.moveaxis(pad(B_stack.astype(f32)), 0, -1)
    d_l = jnp.moveaxis(pad(defects.astype(f32)), 0, -1)

    def spec(*dims):
        nd = len(dims)
        return pl.BlockSpec(
            dims + (LANES,),
            lambda b, _nd=nd: (0,) * _nd + (b,),
            memory_space=pltpu.VMEM,
        )

    S_l, phi_l = pl.pallas_call(
        _condense_kernel,
        grid=(Bp // LANES,),
        in_specs=[spec(Nt, N_X, N_X), spec(Nt, N_X, N_U), spec(Nt, N_X)],
        out_specs=[spec(Nt, N_X, n), spec(Nt, N_X)],
        out_shape=[
            jax.ShapeDtypeStruct((Nt, N_X, n, Bp), f32),
            jax.ShapeDtypeStruct((Nt, N_X, Bp), f32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(A_l, B_l, d_l)
    S_all = jnp.moveaxis(S_l, -1, 0)[:B].astype(dtype)
    phi_all = jnp.moveaxis(phi_l, -1, 0)[:B].astype(dtype)
    return S_all, phi_all
