"""Independent rigid-contact oracle: velocity-level LCP via projected
Gauss-Seidel (sequential impulses), PyBullet's algorithm.

The reference environment's physics is PyBullet's btMultiBody pipeline:
hard (rigid) contacts resolved by a sequential-impulse PGS solver with
``numSolverIterations = 300/action_repeat = 30`` at 1 kHz
(quadruped_gym_env.py:113,302), friction pyramid at mu set per-reset
(quadruped.py:670-676), URDF joint limits enforced as constraints, and
split-impulse position stabilization. pybullet itself is not installable
in this environment (zero egress), so this module re-implements that
*algorithm* from scratch as the fidelity oracle the compliant-contact
production simulator (models/dynamics.py) is gated against
(tests/test_golden_trace.py, BASELINE.json <2% torque deviation).

Independence: the contact resolution here shares NOTHING with the
production path — it is a rigid LCP solved iteratively in float64 NumPy,
vs the production compliant penalty model in f32 JAX. The smooth
rigid-body terms (mass matrix, bias forces, site kinematics) are reused
from models/dynamics.py because they are themselves pinned against a
second, fully independent Euler-Lagrange autodiff oracle
(tests/test_dynamics_oracle.py, 1e-5 in f64) — per the round-1 review
(VERDICT.md "Next round" #1) that reuse is the prescribed design.

Algorithm per 1 ms step (btSequentialImpulseConstraintSolver /
btMultiBodyConstraintSolver structure):
  1. u_free = u + dt * M^-1 (tau_gen - h)          (unconstrained step)
  2. rows: per penetrating site a normal row (lambda_n >= 0) and two
     tangent rows (|lambda_t| <= mu * lambda_n, friction pyramid with
     per-direction clamp, friction solved against the current normal
     impulse exactly like Bullet); per violated URDF joint limit a
     unilateral row.
  3. 30 PGS sweeps over all rows on the velocity problem with zero
     restitution (v_n+ >= 0; no Baumgarte term on the velocity level).
  4. split-impulse position pass: a second PGS solve on pseudo-velocities
     with bias (beta/dt)*max(phi - slop, 0) whose result moves POSITIONS
     only (Bullet m_splitImpulse=true default; no kinetic energy is
     injected by penetration recovery).
  5. semi-implicit Euler integrate; clamp |qd| at the URDF limit
     (maxJointVelocity=30.1, quadruped.py:678-683).
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import build_model


@dataclasses.dataclass
class OracleParams:
    dt: float = 0.001
    n_iterations: int = 30      # 300/action_repeat, quadruped_gym_env.py:113
    friction: float = 1.0       # quadruped.py:670-676
    erp: float = 0.2            # Bullet btContactSolverInfo m_erp2 default
    contact_slop: float = 0.0   # allowed penetration
    n_position_iterations: int = 10


@dataclasses.dataclass
class OracleState:
    """f64 mirror of dyn.RobotState (plain numpy)."""
    pos: np.ndarray
    quat: np.ndarray
    lin_vel: np.ndarray
    ang_vel: np.ndarray
    q: np.ndarray
    qd: np.ndarray

    @classmethod
    def from_robot_state(cls, s) -> "OracleState":
        return cls(*(np.asarray(x, np.float64) for x in
                     (s.pos, s.quat, s.lin_vel, s.ang_vel, s.q, s.qd)))

    def to_robot_state(self) -> dyn.RobotState:
        return dyn.RobotState(
            pos=jnp.asarray(self.pos, jnp.float32),
            quat=jnp.asarray(self.quat, jnp.float32),
            lin_vel=jnp.asarray(self.lin_vel, jnp.float32),
            ang_vel=jnp.asarray(self.ang_vel, jnp.float32),
            q=jnp.asarray(self.q, jnp.float32),
            qd=jnp.asarray(self.qd, jnp.float32))


def _smooth_terms(model, state: dyn.RobotState):
    """M(q), h(q,u), site kinematics from the validated analytic model."""
    R = sp.quat_to_mat(state.quat)
    u = jnp.concatenate([R.T @ state.ang_vel, R.T @ state.lin_vel, state.qd])
    A, B, D, fk, s = dyn.mass_matrix_blocks(model, state.q)
    h = dyn.bias_forces(model, R, u, fk, s)
    M = dyn.mass_matrix(model, state.q)
    pts_b, radii = dyn.contact_sites(model, fk)
    p_w = state.pos + pts_b @ R.T
    return {"M": M, "h": h, "u": u, "R": R, "pts_b": pts_b, "radii": radii,
            "p_w": p_w, "axes": fk["axes"], "o": fk["o"]}


class LCPOracle:
    """Rigid-contact simulator. All hot math is float64 NumPy; the smooth
    terms are evaluated through one jitted JAX function per step."""

    def __init__(self, enable_springs: bool = True,
                 params: OracleParams = OracleParams()):
        self.model = build_model()
        self.params = params
        self._terms = jax.jit(lambda s: _smooth_terms(self.model, s))
        self._vel_lim = None  # set by callers that clamp (env parity)

    # -- jacobians -------------------------------------------------------
    @staticmethod
    def _site_jacobians(R, pts_b, axes, origins):
        """(12, 3, 18) world point-velocity Jacobians wrt u=[w_b,v_b,qd].

        v_w = R (v_b + w_b x p_b + sum_j a_j x (p_b - o_j) qd_j): columns
        are -hat(p_b) for w_b, I for v_b, a_j x (p_b - o_j) for the three
        joints of the site's leg (trunk sites: joint columns zero).
        """
        J = np.zeros((12, 3, 18))
        for i in range(12):
            p = pts_b[i]
            J[i, :, 0:3] = -_hat(p)
            J[i, :, 3:6] = np.eye(3)
            if i < 8:                      # feet 0-3 / knees 4-7 on leg i%4
                leg = i % 4
                for j in range(3):
                    col = np.cross(axes[leg, j], p - origins[leg, j])
                    J[i, :, 6 + 3 * leg + j] = col
        return np.einsum("ab,ibk->iak", R, J)

    # -- one step --------------------------------------------------------
    def step(self, st: OracleState, tau: np.ndarray) -> OracleState:
        prm = self.params
        dt = prm.dt
        t = self._terms(st.to_robot_state())
        M = np.asarray(t["M"], np.float64)
        h = np.asarray(t["h"], np.float64)
        R = np.asarray(t["R"], np.float64)
        p_w = np.asarray(t["p_w"], np.float64)
        radii = np.asarray(t["radii"], np.float64)
        Minv = np.linalg.inv(M)

        u = np.asarray(t["u"], np.float64)
        tau_gen = np.concatenate([np.zeros(6), np.asarray(tau, np.float64)])
        u_free = u + dt * (Minv @ (tau_gen - h))

        # ---- constraint rows ----
        phi = radii - p_w[:, 2]                      # penetration depth
        active = np.where(phi > -1e-4)[0]            # near/under the plane
        Jsites = self._site_jacobians(
            R, np.asarray(t["pts_b"], np.float64),
            np.asarray(t["axes"], np.float64), np.asarray(t["o"], np.float64))

        rows = []        # (J_row (18,), kind, site_or_joint, pos_bias)
        for i in active:
            Ji = Jsites[i]
            rows.append((Ji[2], "n", i,
                         (prm.erp / dt) * max(phi[i] - prm.contact_slop, 0.0)))
            rows.append((Ji[0], "t", i, 0.0))
            rows.append((Ji[1], "t", i, 0.0))
        lower = np.asarray(dyn.REAL_LOWER, np.float64)
        upper = np.asarray(dyn.REAL_UPPER, np.float64)
        for j in range(12):
            if st.q[j] < lower[j]:
                e = np.zeros(18); e[6 + j] = 1.0     # qd_j >= 0 pushes out
                rows.append((e, "n", None,
                             (prm.erp / dt) * (lower[j] - st.q[j])))
            elif st.q[j] > upper[j]:
                e = np.zeros(18); e[6 + j] = -1.0
                rows.append((e, "n", None,
                             (prm.erp / dt) * (st.q[j] - upper[j])))

        if rows:
            J = np.stack([r[0] for r in rows])                 # (m, 18)
            MinvJT = Minv @ J.T                                # (18, m)
            diag = np.einsum("ma,am->m", J, MinvJT)
            diag = np.maximum(diag, 1e-12)
            kinds = [r[1] for r in rows]
            sites = [r[2] for r in rows]
            pos_bias = np.array([r[3] for r in rows])

            # normal-impulse index per friction row (Bullet couples the
            # friction bound to the CURRENT normal impulse each sweep)
            n_of_site = {}
            for m, (k, sblock) in enumerate(zip(kinds, sites)):
                if k == "n" and sblock is not None:
                    n_of_site[sblock] = m

            # ---- velocity PGS (zero restitution, no position bias) ----
            lam = np.zeros(len(rows))
            v = J @ u_free                                     # row velocities
            for _ in range(prm.n_iterations):
                for m in range(len(rows)):
                    if kinds[m] == "n":
                        new = max(lam[m] - v[m] / diag[m], 0.0)
                    else:
                        lim = prm.friction * lam[n_of_site[sites[m]]]
                        new = np.clip(lam[m] - v[m] / diag[m], -lim, lim)
                    dl = new - lam[m]
                    if dl != 0.0:
                        lam[m] = new
                        v += dl * (J @ MinvJT[:, m])
            u_new = u_free + MinvJT @ lam

            # ---- split-impulse position pass (normal rows only) ----
            lam_p = np.zeros(len(rows))
            vp = J @ np.zeros(18) - pos_bias                   # pseudo residual
            u_pseudo = np.zeros(18)
            for _ in range(prm.n_position_iterations):
                for m in range(len(rows)):
                    if kinds[m] != "n" or pos_bias[m] == 0.0:
                        continue
                    res = J[m] @ u_pseudo - pos_bias[m]
                    new = max(lam_p[m] - res / diag[m], 0.0)
                    dl = new - lam_p[m]
                    if dl != 0.0:
                        lam_p[m] = new
                        u_pseudo += dl * MinvJT[:, m]
            del vp
        else:
            u_new = u_free
            u_pseudo = np.zeros(18)

        # ---- integrate (semi-implicit Euler, pseudo-vel on positions) ----
        w_b = u_new[0:3]
        v_b = u_new[3:6]
        qd = u_new[6:18]
        if self._vel_lim is not None:
            qd = np.clip(qd, -self._vel_lim, self._vel_lim)
        w_int = w_b + u_pseudo[0:3]
        v_int = v_b + u_pseudo[3:6]
        qd_int = qd + u_pseudo[6:18]

        pos = st.pos + dt * (R @ v_int)
        quat = _quat_integrate(st.quat, w_int, dt)
        q = st.q + dt * qd_int
        return OracleState(pos=pos, quat=quat, lin_vel=R @ v_b,
                           ang_vel=R @ w_b, q=q, qd=qd)

    # -- contact info (GetContactInfo surface parity) --------------------
    def feet_in_contact(self, st: OracleState) -> np.ndarray:
        t = self._terms(st.to_robot_state())
        phi = np.asarray(t["radii"] - t["p_w"][:, 2], np.float64)
        return phi[:4] > -1e-4


def _hat(v):
    return np.array([[0.0, -v[2], v[1]],
                     [v[2], 0.0, -v[0]],
                     [-v[1], v[0], 0.0]])


def _quat_integrate(quat_xyzw, w_body, dt):
    """Exact exponential-map quaternion step (matches spatial.quat_integrate)."""
    th = np.linalg.norm(w_body) * dt
    if th < 1e-12:
        dq = np.array([0.5 * dt * w_body[0], 0.5 * dt * w_body[1],
                       0.5 * dt * w_body[2], 1.0])
    else:
        axis = w_body / np.linalg.norm(w_body)
        dq = np.concatenate([np.sin(th / 2) * axis, [np.cos(th / 2)]])
    x1, y1, z1, w1 = quat_xyzw
    x2, y2, z2, w2 = dq
    # body-frame increment: q' = q * dq
    out = np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])
    return out / np.linalg.norm(out)
