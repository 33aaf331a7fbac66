"""Floating-base rigid-body dynamics for Go1 — analytic, batched, TPU-first.

This module replaces the reference's PyBullet C++ engine surface
(stepSimulation + setJointMotorControl2(TORQUE) + getJointState/getBase*,
quadruped_gym_env.py:218-225, quadruped.py:288-321) with closed-form
articulated dynamics:

  * CRBA mass matrix + RNEA bias forces in **base coordinates**, exploiting
    the Go1 star topology (4 identical 3-joint serial legs hanging off a
    free-flyer trunk). The 18x18 system is solved with a Schur complement:
    four 3x3 leg blocks + one 6x6 base block — all tiny dense ops that vmap
    over legs and over scenario batches onto the TPU VPU; no dynamic shapes,
    no per-body Python loops beyond the fixed depth-3 chain unroll.
  * Compliant foot-sphere-vs-plane contact with regularized Coulomb friction
    (PyBullet solves an LCP with 30 iterations, quadruped_gym_env.py:113;
    a compliant model is the natural XLA-friendly equivalent).
  * Semi-implicit Euler at 1 kHz (time_step=0.001, quadruped_gym_env.py:55),
    joint velocity clamp at 30.1 rad/s (quadruped.py:678-683) and joint-limit
    penalty torques (PyBullet enforces URDF limits as constraints).

Conventions: quaternions xyzw; spatial vectors [angular; linear]; the
generalized velocity is u = [ω_b(3); v_b(3); qd(12)] with base twist
expressed in the base frame (so du/dt equals the spatial acceleration
components — Featherstone §2.10).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import Go1Model

# Real actuator joint limits (urdf:117,169,196) used for limit penalties.
REAL_LOWER = jnp.array([-1.0471975512, -0.663225115758, -2.72271363311] * 4)
REAL_UPPER = jnp.array([1.0471975512, 2.96705972839, -0.837758040957] * 4)


@struct.dataclass
class RobotState:
    """Dynamic state of one robot. All world-frame quantities for direct
    parity with PyBullet getters (GetBasePosition / GetBaseLinearVelocity /
    GetBaseAngularVelocity, quadruped.py:150-185)."""
    pos: jnp.ndarray        # (3,) base origin, world
    quat: jnp.ndarray       # (4,) xyzw, base->world
    lin_vel: jnp.ndarray    # (3,) base origin velocity, world
    ang_vel: jnp.ndarray    # (3,) angular velocity, world
    q: jnp.ndarray          # (12,) joint angles
    qd: jnp.ndarray         # (12,) joint velocities


@struct.dataclass
class SimParams:
    """Contact / integration parameters (compliant-contact tuning knobs)."""
    dt: float = struct.field(pytree_node=False, default=0.001)
    contact_stiffness: jnp.ndarray = None   # N/m
    contact_damping: jnp.ndarray = None     # N s/m
    friction: jnp.ndarray = None            # lateral mu (randomized in [0.5,1])
    slip_vel_tol: float = struct.field(pytree_node=False, default=0.02)
    joint_limit_stiffness: float = struct.field(pytree_node=False, default=300.0)
    joint_limit_damping: float = struct.field(pytree_node=False, default=3.0)
    on_rack: bool = struct.field(pytree_node=False, default=False)
    # Clamp |d·φ̇| ≤ k·φ in the contact normal force: required on the stiff
    # execution model (explicit damping pumps energy at impact — hopping
    # limit cycle otherwise), unnecessary on the MPC planner's relaxed
    # contact where it rarely binds but costs ~1.8x solve throughput
    # through the linearization's fusion schedule.
    clamp_damping: bool = struct.field(pytree_node=False, default=True)
    # Tangential (stiction) anchor springs for the FEET: Coulomb friction
    # with a per-foot anchor point (Cundall spring / bristle model). The
    # viscous-regularized cone alone lets a PD-held stance CREEP (~4 cm/s
    # measured vs the rigid-LCP oracle, which sticks like PyBullet); the
    # anchor spring holds static loads with a ~1 mm displacement instead.
    # Active only when a foot_anchor state is threaded through step()
    # (the env execution path does; the MPC planner keeps the cheaper
    # memoryless model).
    tangential_stiffness: jnp.ndarray = None  # N/m
    tangential_damping: jnp.ndarray = None    # N s/m


def default_sim_params(dt: float = 0.001, on_rack: bool = False) -> SimParams:
    # Constants tuned against the rigid-LCP oracle (scripts/tune_contact.py
    # sweep vs utils/lcp_oracle.py traces): stiffer = closer to PyBullet's
    # rigid contact (launch-load sink F/kn is the dominant torque-parity
    # error), bounded by explicit-integration stability at the 0.06 kg foot
    # link: dt*sqrt(k/m) < 2 -> k < 240 kN/m; dt*c/m < 2 -> c < 120.
    #   kn=180k: dt*w = 1.73, zeta(normal, c=100) = 0.48
    #   kt=120k: dt*w = 1.41, zeta(tangential, c=60) = 0.35
    # Measured parity vs the oracle (JIP trace): settle 1.0%, crouch 3.1%,
    # launch 3.0%, flight 0.4% knot-mean torque deviation; apex +4.5 mm.
    # (Round-1 values kn=30k/dn=600 had dn unstable at the foot scale —
    # 112 Hz chatter that rectified into a 4 cm/s stance creep.)
    return SimParams(
        dt=dt,
        contact_stiffness=jnp.asarray(180000.0),
        contact_damping=jnp.asarray(100.0),
        friction=jnp.asarray(1.0),  # quadruped.py:670-676 sets mu=1.0
        tangential_stiffness=jnp.asarray(120000.0),
        tangential_damping=jnp.asarray(60.0),
        on_rack=on_rack,
    )


# ---------------------------------------------------------------------------
# Forward kinematics of the dynamics tree (base frame). Unlike
# kinematics.py (analytic leg-frame model with l1=0.0847 used for control &
# observation parity), this uses the true URDF tree (hip y=0.04675 + thigh
# y=0.08) so the physics matches the simulated robot.
# ---------------------------------------------------------------------------

def _rot_x(t):
    c, s = jnp.cos(t), jnp.sin(t)
    one, zero = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack(
        [one, zero, zero, zero, c, -s, zero, s, c], axis=-1
    ).reshape(t.shape + (3, 3))


def _rot_y(t):
    c, s = jnp.cos(t), jnp.sin(t)
    one, zero = jnp.ones_like(t), jnp.zeros_like(t)
    return jnp.stack(
        [c, zero, s, zero, one, zero, -s, zero, c], axis=-1
    ).reshape(t.shape + (3, 3))


def leg_fk_base(model: Go1Model, q: jnp.ndarray):
    """FK of all legs in the base frame.

    Args:
      q: (12,) joint angles.
    Returns dict with, per leg (leading dim 4):
      R: (4,3,3,3) body rotations (hip,thigh,calf), o: (4,3,3) body origins,
      axes: (4,3,3) joint axes in base coords, foot: (4,3) foot points.
    """
    ql = q.reshape(4, 3)
    R1 = _rot_x(ql[:, 0])                      # (4,3,3)
    R2 = R1 @ _rot_y(ql[:, 1])
    R3 = R2 @ _rot_y(ql[:, 2])
    o1 = model.hip_origins                     # (4,3)
    o2 = o1 + jnp.einsum("lij,lj->li", R1, model.thigh_origins)
    o3 = o2 + jnp.einsum("lij,j->li", R2, model.calf_origin)
    foot = o3 + jnp.einsum("lij,j->li", R3, model.foot_origin)
    x_axis = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], dtype=q.dtype), (4, 3))
    a1 = x_axis                                # hip axis: x in trunk frame
    y_axis = jnp.array([0.0, 1.0, 0.0], dtype=q.dtype)
    a2 = R1 @ y_axis                           # thigh axis: y in hip frame
    a3 = R2 @ y_axis                           # calf axis: y in thigh frame
    R = jnp.stack([R1, R2, R3], axis=1)        # (4,3,3,3)
    o = jnp.stack([o1, o2, o3], axis=1)        # (4,3,3)
    axes = jnp.stack([a1, a2, a3], axis=1)     # (4,3,3)
    return {"R": R, "o": o, "axes": axes, "foot": foot}


def _motion_subspaces(fk):
    """Plücker motion axes s = [a; o × a] per joint, base coords. (4,3,6)."""
    a = fk["axes"]
    o = fk["o"]
    return jnp.concatenate([a, jnp.cross(o, a)], axis=-1)


def _body_inertias_base(model: Go1Model, fk):
    """Spatial inertias of leg bodies expressed about the base origin. (4,3,6,6)."""
    return sp.transform_spatial_inertia(model.leg_inertias6, fk["R"], fk["o"])


def mass_matrix_blocks(model: Go1Model, q: jnp.ndarray, fk=None):
    """CRBA in base coordinates, returned in star-topology block form.

    Returns:
      A: (6,6) base block, B: (4,6,3) base-leg coupling, D: (4,3,3) leg blocks,
      plus fk/s for reuse.
    """
    if fk is None:
        fk = leg_fk_base(model, q)
    s = _motion_subspaces(fk)                  # (4,3,6)
    I_b = _body_inertias_base(model, fk)       # (4,3,6,6)
    # composite inertias from tip: Ic[j] = sum_{b>=j} I_b
    Ic2 = I_b[:, 2]
    Ic1 = I_b[:, 1] + Ic2
    Ic0 = I_b[:, 0] + Ic1
    Ic = jnp.stack([Ic0, Ic1, Ic2], axis=1)    # (4,3,6,6)
    # F[j] = Ic[j] s[j]  -> base-leg coupling columns
    F = jnp.einsum("ljab,ljb->lja", Ic, s)     # (4,3,6)
    B = jnp.swapaxes(F, 1, 2)                  # (4,6,3)
    # D[i,j] = s_i^T Ic_max(i,j) s_j ; build via F: D[i,j>=i] = F_j^T s_i
    D = jnp.einsum("lja,lia->lij", F, s)       # D[l,i,j] = s_i . F_j = s_i^T Ic_j s_j
    # valid for j >= i; symmetrize using upper triangle (j >= i)
    iu = jnp.triu(jnp.ones((3, 3), dtype=bool))
    D = jnp.where(iu, D, jnp.swapaxes(D, -1, -2))
    A = model.trunk_inertia6 + jnp.sum(Ic0, axis=0)
    return A, B, D, fk, s


def bias_forces(model: Go1Model, state_rot: jnp.ndarray, u: jnp.ndarray,
                fk, s) -> jnp.ndarray:
    """RNEA with qdd=0 and the gravity trick (a_root = [0; -R^T g]).

    Args:
      state_rot: (3,3) base rotation matrix (body->world).
      u: (18,) generalized velocity [w_b, v_b, qd].
    Returns:
      h: (18,) bias force (Coriolis + centrifugal + gravity).
    """
    v0 = u[:6]
    qd = u[6:].reshape(4, 3)
    I_legs = _body_inertias_base(model, fk)    # (4,3,6,6)

    # body velocities down each chain
    v1 = v0 + s[:, 0] * qd[:, 0:1]
    v2 = v1 + s[:, 1] * qd[:, 1:2]
    v3 = v2 + s[:, 2] * qd[:, 2:3]
    v = jnp.stack([v1, v2, v3], axis=1)        # (4,3,6)

    g_base = state_rot.T @ model.gravity
    a0 = jnp.concatenate([jnp.zeros(3, dtype=u.dtype), -g_base])
    a1 = a0 + sp.spatial_cross_motion(v1, s[:, 0]) * qd[:, 0:1]
    a2 = a1 + sp.spatial_cross_motion(v2, s[:, 1]) * qd[:, 1:2]
    a3 = a2 + sp.spatial_cross_motion(v3, s[:, 2]) * qd[:, 2:3]
    a = jnp.stack([a1, a2, a3], axis=1)        # (4,3,6)

    # net forces f = I a + v x* (I v)
    Iv = jnp.einsum("ljab,ljb->lja", I_legs, v)
    f = jnp.einsum("ljab,ljb->lja", I_legs, a) + sp.spatial_cross_force(v, Iv)
    # accumulate from tip
    f2 = f[:, 2]
    f1 = f[:, 1] + f2
    f0 = f[:, 0] + f1
    f_acc = jnp.stack([f0, f1, f2], axis=1)    # (4,3,6)
    h_joints = jnp.einsum("lja,lja->lj", s, f_acc).reshape(12)

    Itv = model.trunk_inertia6 @ v0
    f_trunk = model.trunk_inertia6 @ a0 + sp.spatial_cross_force(v0, Itv)
    h_base = f_trunk + jnp.sum(f0, axis=0)
    return jnp.concatenate([h_base, h_joints])


def solve_star(A, B, D, rhs_base, rhs_joints, eps: float = 1e-9):
    """Solve [[A, B],[B^T, D]] [a0; qdd] = [rhs_base; rhs_joints] with D
    block-diagonal per leg. All small dense ops; batches via vmap."""
    eye3 = jnp.eye(3, dtype=A.dtype)
    Dinv = jnp.linalg.inv(D + eps * eye3)               # (4,3,3)
    rj = rhs_joints.reshape(4, 3)
    BDinv = jnp.einsum("lab,lbc->lac", B, Dinv)          # (4,6,3)
    S = A - jnp.einsum("lac,lbc->ab", BDinv, B)          # 6x6 Schur
    t = rhs_base - jnp.einsum("lac,lc->a", BDinv, rj)
    a0 = jnp.linalg.solve(S + eps * jnp.eye(6, dtype=A.dtype), t)
    qdd = jnp.einsum("lab,lb->la", Dinv, rj - jnp.einsum("lba,b->la", B, a0))
    return a0, qdd.reshape(12)


# ---------------------------------------------------------------------------
# Contact
#
# Collision sites: 4 foot spheres (r=0.02, urdf:231-235) + body "bumpers" —
# 4 knee spheres (calf joint origin) and 4 trunk corners — so a crashed or
# inverted robot collides with the ground like PyBullet's full-link
# collision does, instead of only the feet. Feet are sites [0:4]; only they
# feed the GetContactInfo surface (forces/bools); knee/trunk penetration
# feeds the invalid-contact termination (quadruped.py:224-258).
# ---------------------------------------------------------------------------

KNEE_RADIUS = 0.008  # urdf calf collision = 0.213x0.016x0.016 box
# (urdf:206-211): 8 mm half-thickness at the knee end. A 0.02 sphere
# was measured to FALSELY terminate upright backflip landings (rear
# knee grazes ground by 1-2 mm in the deep landing crouch), withholding
# the reference's +0.2 upright bonus (robot_tasks.py:546-549).
TRUNK_RADIUS = 0.055
TRUNK_CORNERS = jnp.array([
    [0.18, 0.065, 0.0], [0.18, -0.065, 0.0],
    [-0.18, 0.065, 0.0], [-0.18, -0.065, 0.0],
])
N_SITES = 12  # 4 feet + 4 knees + 4 trunk corners


def contact_sites(model: Go1Model, fk):
    """Base-frame positions + radii of all collision sites. (12,3), (12,)."""
    feet = fk["foot"]
    knees = fk["o"][:, 2]
    trunk = jnp.asarray(TRUNK_CORNERS, feet.dtype)
    pts = jnp.concatenate([feet, knees, trunk], axis=0)
    radii = jnp.concatenate([
        jnp.full(4, model.foot_radius), jnp.full(4, KNEE_RADIUS),
        jnp.full(4, TRUNK_RADIUS)]).astype(feet.dtype)
    return pts, radii


def site_state_world(model: Go1Model, state: RobotState, fk=None):
    """World positions and velocities of all 12 collision sites."""
    if fk is None:
        fk = leg_fk_base(model, state.q)
    R = sp.quat_to_mat(state.quat)
    pts_b, radii = contact_sites(model, fk)               # (12,3)
    p_w = state.pos + pts_b @ R.T
    w_b = R.T @ state.ang_vel
    v_b = R.T @ state.lin_vel
    qd = state.qd.reshape(4, 3)
    # joint contribution: sum_i a_i x (p - o_i) qd_i per leg point; zero for
    # trunk points. Feet/knees of leg l move with leg l's joints.
    leg_pts = pts_b[:8].reshape(2, 4, 3)                  # (feet/knees, leg, 3)
    arm = leg_pts[:, :, None, :] - fk["o"][None]          # (2,4,3joints,3)
    Jqd = jnp.sum(jnp.cross(fk["axes"][None], arm) * qd[None, ..., None],
                  axis=2).reshape(8, 3)
    Jqd = jnp.concatenate([Jqd, jnp.zeros((4, 3), Jqd.dtype)], axis=0)
    v_pt_b = v_b + jnp.cross(w_b, pts_b) + Jqd
    v_w = v_pt_b @ R.T
    return p_w, v_w, radii, fk


def foot_state_world(model: Go1Model, state: RobotState, fk=None):
    """World positions and velocities of the 4 foot centers (legacy view)."""
    p_w, v_w, _, fk = site_state_world(model, state, fk)
    return p_w[:4], v_w[:4], fk


def contact_forces(model: Go1Model, params: SimParams, p_w, v_w, radii=None,
                   foot_anchor=None):
    """Compliant normal + Coulomb friction at contact sites.

    Tangential friction:
      * default (foot_anchor=None): viscous-regularized cone — memoryless,
        cheap, used by the MPC planner model.
      * with foot_anchor (4,2): feet get anchor-spring stiction (Cundall /
        bristle): f_t = -kt (p - a) - ct v_t projected onto the friction
        cone, anchor sliding to stay consistent on the cone boundary — true
        static friction like PyBullet's LCP (holds stance without creep).
        Knee/trunk bumper sites keep the viscous model.

    Returns (f_world (N,3), fn (N,), in_contact (N,), new_anchor) —
    new_anchor is None when foot_anchor is None. Sites [0:4] are the
    feetNormalForces / feetInContactBool surface of GetContactInfo
    (quadruped.py:224-258).
    """
    if radii is None:
        radii = model.foot_radius
    phi = radii - p_w[:, 2]                               # penetration depth
    in_contact = phi > 0.0
    phidot = -v_w[:, 2]
    elastic = params.contact_stiffness * phi
    # Damping clamped to the elastic force: the raw d·φ̇ term spikes on
    # impact (φ small, φ̇ large) and pumps energy under explicit
    # integration — measured as a front-leg hopping limit cycle in
    # no-spring stance (qd_max 4.2 rad/s; 0.8 with the clamp). The clamp
    # leaves statics (φ̇=0) untouched.
    damping = params.contact_damping * phidot
    if params.clamp_damping:
        damping = jnp.clip(damping, -elastic, elastic)
    fn = jnp.where(in_contact, jnp.maximum(elastic + damping, 0.0), 0.0)
    vt = v_w[:, :2]
    vt_norm = sp.safe_norm(vt, axis=-1)
    # Coulomb cone, viscous-regularized below slip_vel_tol for stiction.
    scale = params.friction * fn / jnp.maximum(vt_norm, params.slip_vel_tol)
    ft = -scale[:, None] * vt
    new_anchor = None
    if foot_anchor is not None:
        kt = params.tangential_stiffness
        ct = params.tangential_damping
        p_xy = p_w[:4, :2]
        f_trial = -kt * (p_xy - foot_anchor) - ct * v_w[:4, :2]
        f_norm = sp.safe_norm(f_trial, axis=-1)
        fmax = params.friction * fn[:4]
        clip_scale = jnp.minimum(1.0, fmax / jnp.maximum(f_norm, 1e-9))
        f_foot = f_trial * clip_scale[:, None]
        # anchor consistency: inside the cone it stays put; on the boundary
        # it slides so the SPRING term alone reproduces the clipped force
        # (damping is recomputed fresh each step — folding it into the
        # anchor ratchets the anchor along the motion)
        a_slid = p_xy + f_foot / kt
        new_anchor = jnp.where((clip_scale < 1.0)[:, None], a_slid,
                               foot_anchor)
        # a foot out of contact re-anchors at its current position
        new_anchor = jnp.where(in_contact[:4, None], new_anchor, p_xy)
        f_foot = jnp.where(in_contact[:4, None], f_foot, 0.0)
        ft = ft.at[:4].set(f_foot)
    f_world = jnp.concatenate([ft, fn[:, None]], axis=-1)
    return f_world, fn, in_contact, new_anchor


def _generalized_contact_force(model, fk, s, R, f_world):
    """Map world site forces (12 sites) to generalized forces (base coords).

    Sites 0-3 feet and 4-7 knees ride on the calf bodies (all three joints
    of their leg receive s_iᵀ f); sites 8-11 are trunk corners (base wrench
    only). The knee point coincides with the calf joint origin, so its calf-
    joint torque vanishes identically through the same formula.
    """
    f_b = f_world @ R                                     # rotate world->base
    pts, _ = contact_sites(model, fk)                     # (12,3) base frame
    f_spatial = jnp.concatenate([jnp.cross(pts, f_b), f_b], axis=-1)  # (12,6)
    f_legs = f_spatial[:4] + f_spatial[4:8]               # per-leg site sum
    tau_joints = jnp.einsum("lja,la->lj", s, f_legs).reshape(12)
    f_base = jnp.sum(f_spatial, axis=0)
    return f_base, tau_joints


# ---------------------------------------------------------------------------
# Step
# ---------------------------------------------------------------------------

def _default_impl() -> str:
    """Pick the dynamics implementation for the current backend.

    "soa" (models/dynamics_soa.py, scalarized structure-of-arrays) is ~26x
    faster at runtime on TPU (no tile padding, dense lane batching) but its
    unrolled graph is ~10x slower for XLA to compile; on CPU (tests,
    examples, dryruns) the structured "ref" path compiles fast and runtime
    is not the bottleneck. Equivalence of the two paths is pinned by
    tests/test_dynamics_soa.py.
    """
    import jax
    # TPU backends may be registered under plugin names (e.g. "axon");
    # anything that isn't the CPU host platform gets the lane-batched path.
    return "ref" if jax.default_backend() == "cpu" else "soa"


def forward_dynamics(model: Go1Model, params: SimParams, state: RobotState,
                     tau: jnp.ndarray, ext_force_world: jnp.ndarray | None = None,
                     impl: str | None = None,
                     foot_anchor: jnp.ndarray | None = None):
    """One evaluation of the equations of motion.

    Args:
      tau: (12,) joint torques (motor + spring, already combined).
      ext_force_world: optional (3,) force applied at the trunk origin
        (apply_external_force, quadruped.py:338-343).
      impl: "soa" (scalarized TPU hot path), "ref" (this module's
        structured-array implementation, the readable reference/oracle),
        or None = per-backend default (see _default_impl).
      foot_anchor: optional (4,2) world-xy stiction anchors (see
        contact_forces); when given, info carries "new_anchor".
    Returns:
      (a0(6), qdd(12), contact info dict)
    """
    if impl is None:
        impl = _default_impl()
    if impl == "soa":
        from quadruped_springs_tpu.models import dynamics_soa
        return dynamics_soa.forward_dynamics_soa(
            model, params, state, tau, ext_force_world, foot_anchor)
    R = sp.quat_to_mat(state.quat)
    w_b = R.T @ state.ang_vel
    v_b = R.T @ state.lin_vel
    u = jnp.concatenate([w_b, v_b, state.qd])

    A, B, D, fk, s = mass_matrix_blocks(model, state.q)
    h = bias_forces(model, R, u, fk, s)

    p_w, v_w, radii, _ = site_state_world(model, state, fk)
    f_world, fn, in_contact, new_anchor = contact_forces(
        model, params, p_w, v_w, radii, foot_anchor)
    f_base_c, tau_c = _generalized_contact_force(model, fk, s, R, f_world)

    # joint-limit penalty torques (PyBullet enforces URDF limits)
    over = jnp.maximum(state.q - REAL_UPPER, 0.0)
    under = jnp.maximum(REAL_LOWER - state.q, 0.0)
    tau_lim = (
        -params.joint_limit_stiffness * over
        + params.joint_limit_stiffness * under
        - params.joint_limit_damping * state.qd * ((over > 0) | (under > 0))
    )

    rhs_base = -h[:6] + f_base_c
    if ext_force_world is not None:
        f_ext_b = R.T @ ext_force_world
        rhs_base = rhs_base + jnp.concatenate([jnp.zeros(3, state.pos.dtype), f_ext_b])
    rhs_joints = tau + tau_c + tau_lim - h[6:]
    if params.on_rack:
        # base welded in the air (on_rack debug mode, quadruped_gym_env.py:61):
        # constrained dynamics with a0 ≡ 0 -> joints decouple per leg.
        eye3 = jnp.eye(3, dtype=A.dtype)
        a0 = jnp.zeros(6, dtype=A.dtype)
        qdd = jnp.einsum(
            "lab,lb->la", jnp.linalg.inv(D + 1e-9 * eye3),
            rhs_joints.reshape(4, 3)).reshape(12)
    else:
        a0, qdd = solve_star(A, B, D, rhs_base, rhs_joints)
    info = {
        "foot_pos_world": p_w[:4],
        "foot_vel_world": v_w[:4],
        "foot_forces": fn[:4],
        "feet_in_contact": in_contact[:4],
        "contact_force_world": f_world[:4],
        # non-foot ground contact = the invalid-contact termination surface
        "invalid_contact": jnp.any(in_contact[4:]),
    }
    if new_anchor is not None:
        info["new_anchor"] = new_anchor
    return a0, qdd, info


def step(model: Go1Model, params: SimParams, state: RobotState,
         tau: jnp.ndarray, velocity_limits: jnp.ndarray,
         ext_force_world: jnp.ndarray | None = None,
         foot_anchor: jnp.ndarray | None = None,
         impl: str | None = None):
    """Semi-implicit Euler step at params.dt (1 kHz default).

    Mirrors the reference sim-step semantics: torques applied, then
    pybullet.stepSimulation (quadruped_gym_env.py:218-221); joint velocity
    clamped at the configured max (quadruped.py:678-683). With
    `foot_anchor` (4,2) the feet use anchor-spring stiction (see
    contact_forces) and info["new_anchor"] carries the updated anchors.
    `impl` forwards to forward_dynamics ("ref"/"soa"/None=per-backend).
    """
    a0, qdd, info = forward_dynamics(model, params, state, tau,
                                     ext_force_world, impl=impl,
                                     foot_anchor=foot_anchor)
    dt = params.dt
    R = sp.quat_to_mat(state.quat)
    w_b = R.T @ state.ang_vel + dt * a0[:3]
    v_b = R.T @ state.lin_vel + dt * a0[3:]
    qd = jnp.clip(state.qd + dt * qdd, -velocity_limits, velocity_limits)

    if params.on_rack:
        w_b = jnp.zeros_like(w_b)
        v_b = jnp.zeros_like(v_b)

    quat = sp.quat_integrate(state.quat, w_b, dt)
    pos = state.pos + dt * (R @ v_b)
    q = state.q + dt * qd
    new_state = RobotState(
        pos=pos,
        quat=quat,
        lin_vel=R @ v_b,
        ang_vel=R @ w_b,
        q=q,
        qd=qd,
    )
    return new_state, info


# ---------------------------------------------------------------------------
# Diagnostics used by tests (energy / momentum audits)
# ---------------------------------------------------------------------------

def mass_matrix(model: Go1Model, q: jnp.ndarray) -> jnp.ndarray:
    """Dense 18x18 M(q) (for tests/validation; the solver uses blocks)."""
    A, B, D, _, _ = mass_matrix_blocks(model, q)
    top = jnp.concatenate([A, jnp.concatenate(list(B), axis=-1).reshape(6, 12)], axis=-1)
    Bt = jnp.swapaxes(B, 1, 2).reshape(12, 6)
    Dfull = jax.scipy.linalg.block_diag(*[D[i] for i in range(4)])
    bot = jnp.concatenate([Bt, Dfull], axis=-1)
    return jnp.concatenate([top, bot], axis=0)


def kinetic_energy(model: Go1Model, state: RobotState) -> jnp.ndarray:
    R = sp.quat_to_mat(state.quat)
    u = jnp.concatenate([R.T @ state.ang_vel, R.T @ state.lin_vel, state.qd])
    M = mass_matrix(model, state.q)
    return 0.5 * u @ M @ u


def potential_energy(model: Go1Model, state: RobotState) -> jnp.ndarray:
    """-m g . com_world summed over bodies."""
    fk = leg_fk_base(model, state.q)
    R = sp.quat_to_mat(state.quat)
    # trunk COM from its spatial inertia: I[0:3,3:6] = m c×  -> extract
    mcx = model.trunk_inertia6[:3, 3:]
    c_trunk = jnp.array([mcx[2, 1], mcx[0, 2], mcx[1, 0]]) / model.trunk_mass
    coms_b = fk["o"] + jnp.einsum("ljab,ljb->lja", fk["R"], model.leg_coms)
    coms_w = state.pos + coms_b @ R.T                      # (4,3,3)
    trunk_w = state.pos + R @ c_trunk
    pe = -model.trunk_mass * jnp.dot(model.gravity, trunk_w)
    pe += -jnp.sum(model.leg_masses * (coms_w @ model.gravity))
    return pe


def inverse_dynamics(model: Go1Model, state: RobotState,
                     a0: jnp.ndarray, qdd: jnp.ndarray) -> jnp.ndarray:
    """Generalized forces for given accelerations (RNEA, full). Test oracle:
    must satisfy ID(FD(tau)) == tau_gen."""
    R = sp.quat_to_mat(state.quat)
    u = jnp.concatenate([R.T @ state.ang_vel, R.T @ state.lin_vel, state.qd])
    A, B, D, fk, s = mass_matrix_blocks(model, state.q)
    h = bias_forces(model, R, u, fk, s)
    M = mass_matrix(model, state.q)
    return M @ jnp.concatenate([a0, qdd]) + h
