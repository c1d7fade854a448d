"""Fault-aware micro-orbit selection (host-side, per fault pattern).

The reference hard-codes the orbit: omega_des = [0,0,0.6], r_dir = [0,1,0],
|f_virt| = 3.5 N (`ft_mpc/controllers/tools/spiral_parameters.py:30-36`).
Under many double-fault geometries that fixed choice makes the terminal
certificate infeasible -- the attainable acceleration polytope cannot
contain the required (nominal + eMPC box + fb-lin residual) budget around
the default virtual-force point -- and the reference's offline NLP
(`terminal_ingredients.py:57-166`) simply fails; online, its IPOPT then
reports infeasible restorations (`spiraling_mpc.py:347-353`).

A census over the reference plant (healthy + 16 singles + 120 doubles)
shows 85/137 patterns are uncertifiable at the default orbit, yet most
become certifiable by simply *choosing the orbit per fault pattern*: the
spin axis, the orbit direction, and the virtual-force magnitude are free
design parameters of the spiraling strategy, not physics.  E.g. thrusters
8/9 stuck-on (both -y) certify with the virtual force aligned to the
fault (-y) instead of the default +y -- the compensation wrench then
barely uses the hull at all.

`select_orbit` keeps the default orbit when it is certifiable (so default
scenarios are bit-identical to previous rounds) and otherwise maximizes
the certificate's own log-volume objective (`input_bound_box`,
terminal_ingredients.py:137-141 parity) over a candidate grid:

  * r_dir: +-e_x, +-e_y, +-e_z, and the generalized-fault force direction
    (compensation-minimal);
  * omega_des: coordinate axes perpendicular to r_dir (the centripetal
    construction needs omega x r != 0), magnitudes {0.4, 0.6, 0.9};
  * |f_virt|: {1.0, 1.75, 2.5, 3.5} N.

Candidates are screened with a coarse emax grid; the winner is re-scored
on the full grid.  Physically degenerate patterns (e.g. thrusters 12+13:
the surviving z-thrusters' wrench columns are antiparallel, so the
attainable set is flat in the (f_z, tau_x) plane and NO orbit yields a
full-dimensional certificate) are detected cheaply and reported as
uncertifiable -- exactly the patterns where the reference fails too.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ft_mpc_tpu.controllers.spiral_params import SpiralParameters
from ft_mpc_tpu.geometry.polytope import Polytope

DEFAULT_OMEGA = (0.0, 0.0, 0.6)
DEFAULT_R_DIR = (0.0, 1.0, 0.0)
DEFAULT_F_VIRT = 3.5

_OMEGA_MAGS = (0.4, 0.6, 0.9)
_F_VIRT_MAGS = (1.0, 1.75, 2.5, 3.5)
_COARSE_EMAX = np.linspace(0.02, 1.2, 15)


@dataclass
class OrbitChoice:
    omega_des: tuple
    r_dir: tuple
    f_virt_mag: float
    certifiable: bool
    is_default: bool
    r_empc: float  # certified eMPC input-ball radius (0 if uncertifiable)
    objective: float  # certificate log-volume objective (-inf if uncertifiable)


def _score(
    hull: Polytope,
    mass: float,
    inertia: np.ndarray,
    faulty_force_gen: np.ndarray,
    k_omega: np.ndarray,
    omega_des,
    r_dir,
    f_virt_mag: float,
    max_acceleration: float,
    emax_grid=None,
):
    """Certificate objective of one orbit candidate, or None if infeasible."""
    from ft_mpc_tpu.terminal.pipeline import input_bound_box

    sp = SpiralParameters.compute(
        mass, inertia, faulty_force_gen, omega_des, r_dir, f_virt_mag
    )
    try:
        emax, r_empc = input_bound_box(
            hull, sp.M, np.concatenate([sp.f_virt, np.zeros(3)]),
            k_omega, sp.omega_des, sp.r, inertia, max_acceleration,
            emax_grid=emax_grid,
        )
    except RuntimeError:
        return None
    obj = 15.0 * np.log(r_empc) + float(np.sum(np.log(2.0 * k_omega * emax)))
    return obj, float(r_empc)


def _full_dimensional(hull: Polytope) -> bool:
    """Cheap degeneracy screen: does any 6-d ball fit inside the hull?

    The certificate needs a full-dimensional acceleration box; if the
    attainable-wrench set is flat (Chebyshev radius ~ 0, e.g. antiparallel
    surviving thruster columns), no orbit can succeed and the per-candidate
    sweep is skipped entirely.
    """
    try:
        _, radius = hull.chebyshev_center()
        return float(radius) > 1e-9
    except Exception:
        return False


def candidate_orbits(faulty_force_gen: np.ndarray):
    """The (omega_des, r_dir, f_virt_mag) grid searched for faulted patterns.

    Every emitted omega_des is EXACTLY perpendicular to its r_dir: the
    centripetal construction f_virt = m|w|^2 r cancels w x (w x r) only
    when w . r = 0; a non-perpendicular pair leaves a constant unmodeled
    center acceleration (w.r)w that no certificate term covers.  Candidate
    spin axes are therefore the coordinate axes PROJECTED onto the plane
    perpendicular to r_dir and renormalized (deduplicated; axes nearly
    parallel to r_dir rejected).
    """
    eyes = np.eye(3)
    r_dirs = [s * eyes[i] for i in range(3) for s in (1.0, -1.0)]
    f_lin = np.asarray(faulty_force_gen)[:3]
    if np.linalg.norm(f_lin) > 1e-9:
        r_dirs.append(f_lin / np.linalg.norm(f_lin))
    for rd in r_dirs:
        perp = []
        for e in eyes:
            w = e - float(e @ rd) * rd  # project onto plane perpendicular to rd
            n = float(np.linalg.norm(w))
            if n < 0.35:  # e nearly parallel to rd: unstable direction, skip
                continue
            w = w / n
            if any(abs(float(w @ p)) > 1.0 - 1e-9 for p in perp):
                continue  # duplicate axis (two coord axes project identically)
            perp.append(w)
        for ax in perp[:2]:
            for mag in _OMEGA_MAGS:
                for fmag in _F_VIRT_MAGS:
                    yield tuple(mag * ax), tuple(rd), fmag


def select_orbit(
    hull: Polytope,
    mass: float,
    inertia: np.ndarray,
    faulty_force_gen: np.ndarray,
    k_omega=(1.0, 1.0, 1.0),
    max_acceleration: float = 0.0,
) -> OrbitChoice:
    """Pick the micro-orbit for one fault pattern.

    Default-first: if the reference's hard-coded orbit is certifiable it is
    returned unchanged (scenarios built before this feature stay
    bit-identical).  Otherwise the candidate grid is searched and the
    certificate-objective maximizer returned; if nothing certifies, the
    default is returned with `certifiable=False` (callers fall back to the
    uncertified quadratic terminal exactly as before).
    """
    k_omega = np.asarray(k_omega, dtype=np.float64)
    inertia = np.asarray(inertia, dtype=np.float64)
    faulty_force_gen = np.asarray(faulty_force_gen, dtype=np.float64)

    default = _score(
        hull, mass, inertia, faulty_force_gen, k_omega,
        DEFAULT_OMEGA, DEFAULT_R_DIR, DEFAULT_F_VIRT, max_acceleration,
    )
    if default is not None:
        return OrbitChoice(
            omega_des=DEFAULT_OMEGA, r_dir=DEFAULT_R_DIR,
            f_virt_mag=DEFAULT_F_VIRT, certifiable=True, is_default=True,
            r_empc=default[1], objective=default[0],
        )

    if not _full_dimensional(hull):
        return OrbitChoice(
            omega_des=DEFAULT_OMEGA, r_dir=DEFAULT_R_DIR,
            f_virt_mag=DEFAULT_F_VIRT, certifiable=False, is_default=True,
            r_empc=0.0, objective=-np.inf,
        )

    passing = []
    for omega_des, r_dir, fmag in candidate_orbits(faulty_force_gen):
        res = _score(
            hull, mass, inertia, faulty_force_gen, k_omega,
            omega_des, r_dir, fmag, max_acceleration,
            emax_grid=_COARSE_EMAX,
        )
        if res is not None:
            passing.append((res[0], omega_des, r_dir, fmag))

    # Re-score coarse winners on the full emax grid, best-first, and return
    # the first that certifies there too.  The coarse 15-point screen can
    # disagree with the full grid; a candidate that only passes coarse must
    # NOT be reported certifiable with stale coarse numbers (the full-grid
    # `input_bound_box` inside compute_terminal_ingredients would raise).
    for _, omega_des, r_dir, fmag in sorted(passing, key=lambda t: -t[0]):
        refined = _score(
            hull, mass, inertia, faulty_force_gen, k_omega,
            omega_des, r_dir, fmag, max_acceleration,
        )
        if refined is None:
            continue
        obj, r_empc = refined
        return OrbitChoice(
            omega_des=tuple(float(v) for v in omega_des),
            r_dir=tuple(float(v) for v in r_dir),
            f_virt_mag=float(fmag),
            certifiable=True, is_default=False,
            r_empc=r_empc, objective=obj,
        )

    return OrbitChoice(
        omega_des=DEFAULT_OMEGA, r_dir=DEFAULT_R_DIR,
        f_virt_mag=DEFAULT_F_VIRT, certifiable=False, is_default=True,
        r_empc=0.0, objective=-np.inf,
    )
