"""Fused Pallas kernel for ADMM iterations (one-sided QP, dense operator).

The XLA path for the ADMM inner loop launches ~15 kernels per iteration and
re-reads K^{-1} (B x 128 x 128) and G (B x m x 128) from HBM every iteration.
This kernel runs *all* iterations for one scenario inside a single Pallas
program: K^{-1}, G, and the iterate vectors stay resident in VMEM, so HBM
traffic drops from O(iters x (K + G)) to O(K + G) and the per-iteration
kernel-launch overhead disappears.  The grid is the scenario batch; Mosaic
pipelines the per-scenario loads against compute automatically.

Solves    min 1/2 x'Hx + g'x   s.t.  G x <= h
with the same over-relaxed iteration as `solvers/mpc_qp.py` (single rho
phase; the caller does rho adaptation across solves via the warm carry).

Layout: n-vectors as (128, 1), constraint vectors as (m_pad, 1); matrices
(128, 128) and (m_pad, 128) with zero padding (padded rows get h = BIG so
they never activate; K^{-1} is padded with an identity block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_PAD = 128
_BIG = 1e8


def _admm_kernel_single(
    rho_ref,  # VMEM (8, 128) broadcast scalar (read [0, 0])
    kinv_ref,  # (N_PAD, N_PAD)
    G_ref,  # (m_pad, N_PAD)
    g_ref,  # (N_PAD, 1)
    h_ref,  # (m_pad, 1)
    y0_ref,  # (m_pad, 1)
    x_out,  # (N_PAD, 1)
    y_out,  # (m_pad, 1)
    *,
    sigma: float,
    alpha: float,
    iters: int,
):
    rho = rho_ref[0, 0]
    Kinv = kinv_ref[:]
    G = G_ref[:]
    g = g_ref[:]
    h = h_ref[:]

    x0 = jnp.zeros_like(g)
    y0 = y0_ref[:]
    z0 = jnp.minimum(jnp.dot(G, x0, preferred_element_type=jnp.float32), h)

    def body(_, carry):
        x, z, y = carry
        gty = jnp.dot(G.T, rho * z - y, preferred_element_type=jnp.float32)
        rhs = sigma * x - g + gty
        x_t = jnp.dot(Kinv, rhs, preferred_element_type=jnp.float32)
        x_new = alpha * x_t + (1.0 - alpha) * x
        Gx_t = jnp.dot(G, x_t, preferred_element_type=jnp.float32)
        z_hat = alpha * Gx_t + (1.0 - alpha) * z
        z_new = jnp.minimum(z_hat + y / rho, h)
        y_new = y + rho * (z_hat - z_new)
        return (x_new, z_new, y_new)

    x, z, y = jax.lax.fori_loop(0, iters, body, (x0, z0, y0))
    x_out[:] = x
    y_out[:] = y


def pallas_admm_single(
    Kinv: jnp.ndarray,  # (n, n)
    G: jnp.ndarray,  # (m, n)
    g: jnp.ndarray,  # (n,)
    h: jnp.ndarray,  # (m,)
    y0: jnp.ndarray,  # (m,)
    sigma: float,
    rho: jnp.ndarray,  # scalar
    alpha: float,
    iters: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One-scenario fused ADMM loop; batch by wrapping in `jax.vmap`
    (vmap lifts the gridless pallas_call into a batched grid)."""
    m, n = G.shape
    assert n <= N_PAD
    m_pad = ((m + 7) // 8) * 8

    f32 = jnp.float32
    Kp = jnp.zeros((N_PAD, N_PAD), f32).at[:n, :n].set(Kinv.astype(f32))
    idx = jnp.arange(n, N_PAD)
    Kp = Kp.at[idx, idx].set(1.0)
    Gp = jnp.zeros((m_pad, N_PAD), f32).at[:m, :n].set(G.astype(f32))
    gp = jnp.zeros((N_PAD, 1), f32).at[:n, 0].set(g.astype(f32))
    hp = jnp.full((m_pad, 1), _BIG, f32).at[:m, 0].set(h.astype(f32))
    yp = jnp.zeros((m_pad, 1), f32).at[:m, 0].set(y0.astype(f32))
    rho_arr = jnp.full((8, 128), rho, f32)

    kernel = functools.partial(
        _admm_kernel_single, sigma=float(sigma), alpha=float(alpha), iters=iters
    )
    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x, y = pl.pallas_call(
        kernel,
        in_specs=[vspec() for _ in range(6)],
        out_specs=[vspec(), vspec()],
        out_shape=[
            jax.ShapeDtypeStruct((N_PAD, 1), f32),
            jax.ShapeDtypeStruct((m_pad, 1), f32),
        ],
    )(rho_arr, Kp, Gp, gp, hp, yp)
    return x[:n, 0], y[:m, 0]


def _admm_kernel(
    rho_ref,  # scalar-prefetch (B,): per-scenario penalty
    kinv_ref,  # (N_PAD, N_PAD)
    G_ref,  # (m_pad, N_PAD)
    g_ref,  # (N_PAD, 1)
    h_ref,  # (m_pad, 1)
    y0_ref,  # (m_pad, 1)
    x_out,  # (N_PAD, 1)
    y_out,  # (m_pad, 1)
    *,
    sigma: float,
    alpha: float,
    iters: int,
):
    rho = rho_ref[pl.program_id(0)]

    Kinv = kinv_ref[:]
    G = G_ref[:]
    g = g_ref[:]
    h = h_ref[:]

    x0 = jnp.zeros_like(g)
    y0 = y0_ref[:]
    z0 = jnp.minimum(
        jnp.dot(G, x0, preferred_element_type=jnp.float32), h
    )

    def body(_, carry):
        x, z, y = carry
        gty = jnp.dot(
            G.T, rho * z - y, preferred_element_type=jnp.float32
        )
        rhs = sigma * x - g + gty
        x_t = jnp.dot(Kinv, rhs, preferred_element_type=jnp.float32)
        x_new = alpha * x_t + (1.0 - alpha) * x
        Gx_t = jnp.dot(G, x_t, preferred_element_type=jnp.float32)
        z_hat = alpha * Gx_t + (1.0 - alpha) * z
        z_new = jnp.minimum(z_hat + y / rho, h)
        y_new = y + rho * (z_hat - z_new)
        return (x_new, z_new, y_new)

    x, z, y = jax.lax.fori_loop(0, iters, body, (x0, z0, y0))
    x_out[:] = x
    y_out[:] = y


@functools.partial(jax.jit, static_argnames=("iters", "sigma", "alpha"))
def pallas_admm_iterations(
    Kinv: jnp.ndarray,  # (B, n, n)
    G: jnp.ndarray,  # (B, m, n)
    g: jnp.ndarray,  # (B, n)
    h: jnp.ndarray,  # (B, m)
    y0: jnp.ndarray,  # (B, m)
    sigma: float,
    rho: jnp.ndarray,  # (B,) per-scenario penalty
    alpha: float,
    iters: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the fused iteration kernel.  Returns (x (B, n), y (B, m))."""
    B, m, n = G.shape
    assert n <= N_PAD
    m_pad = ((m + 7) // 8) * 8

    f32 = jnp.float32
    Kp = jnp.zeros((B, N_PAD, N_PAD), f32)
    Kp = Kp.at[:, :n, :n].set(Kinv.astype(f32))
    # identity on the padding diagonal keeps the solve well-defined
    idx = jnp.arange(n, N_PAD)
    Kp = Kp.at[:, idx, idx].set(1.0)
    Gp = jnp.zeros((B, m_pad, N_PAD), f32).at[:, :m, :n].set(G.astype(f32))
    gp = jnp.zeros((B, N_PAD, 1), f32).at[:, :n, 0].set(g.astype(f32))
    hp = jnp.full((B, m_pad, 1), _BIG, f32).at[:, :m, 0].set(h.astype(f32))
    yp = jnp.zeros((B, m_pad, 1), f32).at[:, :m, 0].set(y0.astype(f32))
    rho_arr = jnp.broadcast_to(rho, (B,)).astype(f32)

    kernel = functools.partial(
        _admm_kernel, sigma=float(sigma), alpha=float(alpha), iters=iters
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((None, N_PAD, N_PAD), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m_pad, N_PAD), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, N_PAD, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m_pad, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m_pad, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, N_PAD, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, m_pad, 1), lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
    )
    x, y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, N_PAD, 1), f32),
            jax.ShapeDtypeStruct((B, m_pad, 1), f32),
        ],
    )(rho_arr, Kp, Gp, gp, hp, yp)
    return x[:, :n, 0], y[:, :m, 0]
