"""Scalarized (structure-of-arrays) Go1 forward dynamics — the TPU hot path.

Same math as models/dynamics.py (CRBA + RNEA in base coordinates, star-
topology Schur solve, compliant contact — see that module for the physics
citations), but every per-robot quantity is a *Python-level* structure of
jnp scalars (tuples of () values) rather than a structured array.

Why: under ``vmap`` over scenarios and ``jvp`` tangents, structured arrays
like (4,3,6,6) put tiny axes (3/6) on the tiled trailing dimensions, which
TPU pads to (8,128) tiles — measured 4-28x memory expansion and an OOM at
batch 1024 (f32[1024,50,4,3,6,43,6] padded 4.0x, HLO dump). With scalar
leaves, every op vmaps to a dense (B,) / (T,B) elementwise op: no padding,
perfect VPU lanes, and XLA fuses the unrolled arithmetic into a handful of
kernels. This is the same layout a hand-written Pallas kernel would use
(batch on lanes), achieved while staying differentiable for the iLQR
linearization.

Structure conventions:
  v3: tuple (x, y, z) of scalars.      m3: tuple of 3 rows, each a v3.
  v6: tuple of 6 scalars.              body inertia: (m, h=v3, A=m3 sym)
  Spatial vectors are [angular; linear] split as (w: v3, v: v3).
"""

from __future__ import annotations

import jax.numpy as jnp

from quadruped_springs_tpu.models.go1_params import Go1Model

# ---------------------------------------------------------------------------
# scalar mini-algebra
# ---------------------------------------------------------------------------

def v3_add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def v3_sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def v3_scale(s, a):
    return (s * a[0], s * a[1], s * a[2])


def v3_dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def v3_cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def m3_vec(M, v):
    return (v3_dot(M[0], v), v3_dot(M[1], v), v3_dot(M[2], v))


def m3_T_vec(M, v):
    return (M[0][0] * v[0] + M[1][0] * v[1] + M[2][0] * v[2],
            M[0][1] * v[0] + M[1][1] * v[1] + M[2][1] * v[2],
            M[0][2] * v[0] + M[1][2] * v[1] + M[2][2] * v[2])


def m3_mul(A, B):
    Bt = tuple(zip(*B))
    return tuple(tuple(v3_dot(A[i], Bt[j]) for j in range(3)) for i in range(3))


def m3_mul_T(A, B):
    """A @ Bᵀ."""
    return tuple(tuple(v3_dot(A[i], B[j]) for j in range(3)) for i in range(3))


def m3_add(A, B):
    return tuple(tuple(A[i][j] + B[i][j] for j in range(3)) for i in range(3))


def m3_congruence(R, A):
    """R @ A @ Rᵀ."""
    return m3_mul_T(m3_mul(R, A), R)


def v6_add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def v6_scale(s, a):
    return tuple(s * x for x in a)


def v6_dot(a, b):
    return sum(x * y for x, y in zip(a, b))


def rot_x(t):
    c, s = jnp.cos(t), jnp.sin(t)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return ((one, zero, zero), (zero, c, -s), (zero, s, c))


def rot_y(t):
    c, s = jnp.cos(t), jnp.sin(t)
    one = jnp.ones_like(c)
    zero = jnp.zeros_like(c)
    return ((c, zero, s), (zero, one, zero), (-s, zero, c))


def quat_to_m3(quat):
    """xyzw quaternion array (4,) -> m3 (body->world)."""
    x, y, z, w = quat[0], quat[1], quat[2], quat[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return ((1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
            (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
            (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)))


# body spatial inertia rep: (m, h, A) with h = m*com (base coords, about
# base origin), A = I_com' + m(c·c E − c cᵀ); I6 = [[A, h×],[−h×, mE]].

def inertia_add(a, b):
    return (a[0] + b[0], v3_add(a[1], b[1]), m3_add(a[2], b[2]))


def inertia_matvec(I, w, v):
    """I6 @ [w; v] -> (top v3, bottom v3)."""
    m, h, A = I
    top = v3_add(m3_vec(A, w), v3_cross(h, v))
    bot = v3_add(v3_scale(-1.0, v3_cross(h, w)), v3_scale(m, v))
    return top, bot


def body_inertia_base(m, com_local, I_com_local, R, o):
    """(m, h, A) of a body with local COM/inertia, placed at (R, o)."""
    c = v3_add(o, m3_vec(R, com_local))
    h = v3_scale(m, c)
    Ic = m3_congruence(R, I_com_local)
    cc = v3_dot(c, c)
    A = tuple(tuple(
        Ic[i][j] + m * ((cc if i == j else 0.0) - c[i] * c[j])
        for j in range(3)) for i in range(3))
    return (m, h, A)


# ---------------------------------------------------------------------------
# small dense solves (closed form / unrolled)
# ---------------------------------------------------------------------------

def sym3_inv(D, eps):
    """Inverse of symmetric 3x3 D + eps*E via adjugate."""
    a = D[0][0] + eps
    b, c = D[0][1], D[0][2]
    d = D[1][1] + eps
    e = D[1][2]
    f = D[2][2] + eps
    A = d * f - e * e
    B = c * e - b * f
    C = b * e - c * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / det
    return ((A * inv_det, B * inv_det, C * inv_det),
            (B * inv_det, (a * f - c * c) * inv_det, (b * c - a * e) * inv_det),
            (C * inv_det, (b * c - a * e) * inv_det, (a * d - b * b) * inv_det))


def chol6_solve(S, b, eps):
    """Solve (S + eps*E) x = b for symmetric 6x6 S via unrolled Cholesky."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = S[j][j] + eps
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        L[j][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
        inv = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = S[i][j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv
    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    # back substitution Lᵀ x = y
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return tuple(x)


# ---------------------------------------------------------------------------
# model scalar extraction
# ---------------------------------------------------------------------------

def _model_scalars(model: Go1Model):
    """Pull per-body (m, com, I_com) scalars out of the model arrays.

    leg_inertias6[l,j] is the 6x6 spatial inertia about the link origin:
    A_loc = I_com + m c×c×ᵀ, so I_com = A_loc − m(c·c E − c cᵀ).
    """
    legs = []
    for l in range(4):
        bodies = []
        for j in range(3):
            m = model.leg_masses[l, j]
            c = tuple(model.leg_coms[l, j, i] for i in range(3))
            A_loc = tuple(tuple(model.leg_inertias6[l, j, i, k]
                                for k in range(3)) for i in range(3))
            cc = v3_dot(c, c)
            I_com = tuple(tuple(
                A_loc[i][k] - m * ((cc if i == k else 0.0) - c[i] * c[k])
                for k in range(3)) for i in range(3))
            bodies.append((m, c, I_com))
        legs.append(bodies)
    # trunk: trunk_inertia6 is already about the base origin in base coords.
    tA = tuple(tuple(model.trunk_inertia6[i, k] for k in range(3))
               for i in range(3))
    # h from the skew block I6[:3,3:] = h×: hx=I6[2,4], hy=I6[0,5], hz=I6[1,3]
    th = (model.trunk_inertia6[2, 4], model.trunk_inertia6[0, 5],
          model.trunk_inertia6[1, 3])
    trunk = (model.trunk_mass, th, tA)
    return legs, trunk


# ---------------------------------------------------------------------------
# FK + articulated quantities for one leg
# ---------------------------------------------------------------------------

def _leg_kinematics(model: Go1Model, leg_bodies, l: int, q, qd):
    """FK, motion subspaces, body inertias and velocity terms for leg l.

    Args: q, qd (12,) arrays.
    Returns dict of scalar structures.
    """
    q0, q1, q2 = q[3 * l], q[3 * l + 1], q[3 * l + 2]
    R1 = rot_x(q0)
    R2 = m3_mul(R1, rot_y(q1))
    R3 = m3_mul(R2, rot_y(q2))
    o1 = tuple(model.hip_origins[l, i] for i in range(3))
    thigh_o = tuple(model.thigh_origins[l, i] for i in range(3))
    calf_o = tuple(model.calf_origin[i] for i in range(3))
    foot_o = tuple(model.foot_origin[i] for i in range(3))
    o2 = v3_add(o1, m3_vec(R1, thigh_o))
    o3 = v3_add(o2, m3_vec(R2, calf_o))
    foot = v3_add(o3, m3_vec(R3, foot_o))

    one = jnp.ones_like(q0)
    zero = jnp.zeros_like(q0)
    a1 = (one, zero, zero)                       # hip axis: x in trunk frame
    a2 = (R1[0][1], R1[1][1], R1[2][1])          # y col of R1
    a3 = (R2[0][1], R2[1][1], R2[2][1])          # y col of R2
    axes = (a1, a2, a3)
    os_ = (o1, o2, o3)
    Rs = (R1, R2, R3)
    # motion subspaces s_j = [a; o × a]
    s = tuple(axes[j] + v3_cross(os_[j], axes[j]) for j in range(3))

    I_b = tuple(
        body_inertia_base(leg_bodies[j][0], leg_bodies[j][1],
                          leg_bodies[j][2], Rs[j], os_[j])
        for j in range(3))
    return {"R": Rs, "o": os_, "axes": axes, "s": s, "I": I_b, "foot": foot,
            "qd": (qd[3 * l], qd[3 * l + 1], qd[3 * l + 2])}


def _spatial_cross_motion(vw, vv, mw, mv):
    """[vw;vv] ×ₘ [mw;mv]."""
    return v3_cross(vw, mw), v3_add(v3_cross(vv, mw), v3_cross(vw, mv))


def _spatial_cross_force(vw, vv, fw, fv):
    """[vw;vv] ×f* [fw;fv]."""
    return v3_add(v3_cross(vw, fw), v3_cross(vv, fv)), v3_cross(vw, fv)


# ---------------------------------------------------------------------------
# forward dynamics (scalar core)
# ---------------------------------------------------------------------------

KNEE_RADIUS = 0.008  # urdf calf collision = 0.213x0.016x0.016 box
# (urdf:206-211): 8 mm half-thickness at the knee end. A 0.02 sphere
# was measured to FALSELY terminate upright backflip landings (rear
# knee grazes ground by 1-2 mm in the deep landing crouch), withholding
# the reference's +0.2 upright bonus (robot_tasks.py:546-549).
TRUNK_RADIUS = 0.055
TRUNK_CORNERS = ((0.18, 0.065, 0.0), (0.18, -0.065, 0.0),
                 (-0.18, 0.065, 0.0), (-0.18, -0.065, 0.0))

# Real actuator joint limits (urdf:117,169,196), one (hip,thigh,calf) triple.
REAL_LOWER3 = (-1.0471975512, -0.663225115758, -2.72271363311)
REAL_UPPER3 = (1.0471975512, 2.96705972839, -0.837758040957)


def forward_dynamics_soa(model: Go1Model, params, state, tau,
                         ext_force_world=None, foot_anchor=None):
    """Scalarized equivalent of dynamics.forward_dynamics (same outputs,
    incl. the optional (4,2) foot_anchor stiction state -> info["new_anchor"]
    — see dynamics.contact_forces)."""
    legs_bodies, trunk_I = _model_scalars(model)
    R = quat_to_m3(state.quat)
    w_b = m3_T_vec(R, tuple(state.ang_vel[i] for i in range(3)))
    v_b = m3_T_vec(R, tuple(state.lin_vel[i] for i in range(3)))
    pos = tuple(state.pos[i] for i in range(3))
    g = tuple(model.gravity[i] for i in range(3))
    g_base = m3_T_vec(R, g)
    dtype = state.q.dtype

    legs = [
        _leg_kinematics(model, legs_bodies[l], l, state.q, state.qd)
        for l in range(4)]

    # ---- CRBA blocks + bias per leg -------------------------------------
    A_base = trunk_I
    B_cols = []      # per leg: 3 columns, each v6
    D_legs = []      # per leg: 3x3
    f0_legs = []     # per leg: spatial bias force at hip (w, v)
    h_joints = []    # 12 scalars
    tau_contact = [None] * 12
    site_p = []      # base-frame site positions (feet then knees then trunk)
    site_v = []      # base-frame site velocities

    for l in range(4):
        L = legs[l]
        s = L["s"]
        I1, I2, I3 = L["I"]
        # composite inertias from tip
        Ic3 = I3
        Ic2 = inertia_add(I2, Ic3)
        Ic1 = inertia_add(I1, Ic2)
        A_base = inertia_add(A_base, Ic1)
        Ics = (Ic1, Ic2, Ic3)
        # F_j = Ic_j s_j
        F = []
        for j in range(3):
            sw = s[j][:3]
            sv = s[j][3:]
            top, bot = inertia_matvec(Ics[j], sw, sv)
            F.append(top + bot)
        B_cols.append(tuple(F))
        # D[i][j] = s_i . F_max(i,j)
        D = tuple(tuple(v6_dot(s[min(i, j)], F[max(i, j)])
                        for j in range(3)) for i in range(3))
        D_legs.append(D)

        # ---- bias (RNEA qdd=0) ----
        qd = L["qd"]
        vw, vv = w_b, v_b
        aw = (jnp.zeros_like(qd[0]),) * 3
        av = v3_scale(-1.0, g_base)
        f_acc = []
        vs = []
        for j in range(3):
            sw, sv = s[j][:3], s[j][3:]
            vw = v3_add(vw, v3_scale(qd[j], sw))
            vv = v3_add(vv, v3_scale(qd[j], sv))
            cw, cv = _spatial_cross_motion(vw, vv, sw, sv)
            aw = v3_add(aw, v3_scale(qd[j], cw))
            av = v3_add(av, v3_scale(qd[j], cv))
            Iv_t, Iv_b = inertia_matvec(L["I"][j], vw, vv)
            Ia_t, Ia_b = inertia_matvec(L["I"][j], aw, av)
            xf_t, xf_b = _spatial_cross_force(vw, vv, Iv_t, Iv_b)
            f_acc.append((v3_add(Ia_t, xf_t), v3_add(Ia_b, xf_b)))
            vs.append((vw, vv))
        # accumulate from tip
        f2 = f_acc[2]
        f1 = (v3_add(f_acc[1][0], f2[0]), v3_add(f_acc[1][1], f2[1]))
        f0 = (v3_add(f_acc[0][0], f1[0]), v3_add(f_acc[0][1], f1[1]))
        fs = (f0, f1, f2)
        f0_legs.append(f0)
        for j in range(3):
            h_joints.append(v6_dot(s[j], fs[j][0] + fs[j][1]))

        # ---- contact site kinematics (foot + knee) ----
        for pt in (L["foot"], L["o"][2]):
            arm_v = (jnp.zeros_like(qd[0]),) * 3
            for j in range(3):
                arm = v3_sub(pt, L["o"][j])
                arm_v = v3_add(arm_v, v3_scale(qd[j], v3_cross(L["axes"][j], arm)))
            v_pt = v3_add(v3_add(v_b, v3_cross(w_b, pt)), arm_v)
            site_p.append(pt)
            site_v.append(v_pt)

    # reorder sites: feet [0:4], knees [4:8], trunk [8:12] (matches dynamics.py)
    feet_p = [site_p[2 * l] for l in range(4)]
    feet_v = [site_v[2 * l] for l in range(4)]
    knee_p = [site_p[2 * l + 1] for l in range(4)]
    knee_v = [site_v[2 * l + 1] for l in range(4)]
    zero = jnp.zeros_like(state.q[0])
    trunk_p = [tuple(jnp.asarray(c, dtype) + zero for c in corner)
               for corner in TRUNK_CORNERS]
    trunk_v = [v3_add(v_b, v3_cross(w_b, p)) for p in trunk_p]
    all_p = feet_p + knee_p + trunk_p
    all_v = feet_v + knee_v + trunk_v
    radii = ([model.foot_radius] * 4 + [KNEE_RADIUS] * 4 + [TRUNK_RADIUS] * 4)

    # ---- contact forces (world frame) ----
    mu = params.friction
    kn = params.contact_stiffness
    dn = params.contact_damping
    f_world = []
    fn_list = []
    in_contact = []
    new_anchor = [] if foot_anchor is not None else None
    for i in range(12):
        p_w = v3_add(pos, m3_vec(R, all_p[i]))
        v_w = m3_vec(R, all_v[i])
        phi = radii[i] - p_w[2]
        inc = phi > 0.0
        elastic = kn * phi
        # damping clamped to the elastic force (see dynamics.contact_forces)
        damping = dn * (-v_w[2])
        if params.clamp_damping:
            damping = jnp.clip(damping, -elastic, elastic)
        fn = jnp.where(inc, jnp.maximum(elastic + damping, 0.0), 0.0)
        if foot_anchor is not None and i < 4:
            # anchor-spring stiction (see dynamics.contact_forces)
            kt = params.tangential_stiffness
            ct = params.tangential_damping
            ax, ay = foot_anchor[i, 0], foot_anchor[i, 1]
            fx_t = -kt * (p_w[0] - ax) - ct * v_w[0]
            fy_t = -kt * (p_w[1] - ay) - ct * v_w[1]
            f2 = fx_t * fx_t + fy_t * fy_t
            f_norm = jnp.sqrt(jnp.where(f2 < 1e-18, 1e-18, f2))
            fmax = mu * fn
            cscale = jnp.minimum(1.0, fmax / jnp.maximum(f_norm, 1e-9))
            fx = jnp.where(inc, fx_t * cscale, 0.0)
            fy = jnp.where(inc, fy_t * cscale, 0.0)
            ax2 = jnp.where(inc & (cscale < 1.0), p_w[0] + fx / kt, ax)
            ay2 = jnp.where(inc & (cscale < 1.0), p_w[1] + fy / kt, ay)
            ax2 = jnp.where(inc, ax2, p_w[0])
            ay2 = jnp.where(inc, ay2, p_w[1])
            new_anchor.append((ax2, ay2))
            f_world.append((fx, fy, fn))
        else:
            vt2 = v_w[0] * v_w[0] + v_w[1] * v_w[1]
            vt = jnp.sqrt(jnp.where(vt2 < 1e-12, 1e-12, vt2))
            scale = mu * fn / jnp.maximum(vt, params.slip_vel_tol)
            f_world.append((-scale * v_w[0], -scale * v_w[1], fn))
        fn_list.append(fn)
        in_contact.append(inc)

    # ---- map contact forces to generalized forces ----
    f_base_w = (zero,) * 3
    f_base_v = (zero,) * 3
    tau_c = [zero] * 12
    for i in range(12):
        f_b = m3_T_vec(R, f_world[i])
        trq = v3_cross(all_p[i], f_b)
        f_base_w = v3_add(f_base_w, trq)
        f_base_v = v3_add(f_base_v, f_b)
        if i < 8:
            l = i % 4
            s = legs[l]["s"]
            fsp = trq + f_b
            for j in range(3):
                tau_c[3 * l + j] = tau_c[3 * l + j] + v6_dot(s[j], fsp)

    # ---- joint-limit penalty torques ----
    tau_lim = []
    for k in range(12):
        lo = REAL_LOWER3[k % 3]
        hi = REAL_UPPER3[k % 3]
        over = jnp.maximum(state.q[k] - hi, 0.0)
        under = jnp.maximum(lo - state.q[k], 0.0)
        active = (over > 0) | (under > 0)
        tau_lim.append(-params.joint_limit_stiffness * over
                       + params.joint_limit_stiffness * under
                       - params.joint_limit_damping * state.qd[k] * active)

    # ---- assemble rhs ----
    # trunk bias: f_trunk = I_t a0 + v0 ×f* (I_t v0), a0 = [0; -g_base]
    a0w = (zero,) * 3
    a0v = v3_scale(-1.0, g_base)
    It_vt, It_vb = inertia_matvec(trunk_I, w_b, v_b)
    It_at, It_ab = inertia_matvec(trunk_I, a0w, a0v)
    xt, xb = _spatial_cross_force(w_b, v_b, It_vt, It_vb)
    h_base_top = v3_add(It_at, xt)
    h_base_bot = v3_add(It_ab, xb)
    for f0 in f0_legs:
        h_base_top = v3_add(h_base_top, f0[0])
        h_base_bot = v3_add(h_base_bot, f0[1])

    rhs_base = list(v3_add(v3_scale(-1.0, h_base_top), f_base_w)
                    + v3_add(v3_scale(-1.0, h_base_bot), f_base_v))
    if ext_force_world is not None:
        f_ext_b = m3_T_vec(R, tuple(ext_force_world[i] for i in range(3)))
        for i in range(3):
            rhs_base[3 + i] = rhs_base[3 + i] + f_ext_b[i]
    rhs_base = tuple(rhs_base)

    rhs_joints = [tau[k] + tau_c[k] + tau_lim[k] - h_joints[k]
                  for k in range(12)]

    # ---- solve the star-topology system ----
    eps = 1e-9
    Dinvs = [sym3_inv(D_legs[l], eps) for l in range(4)]
    if params.on_rack:
        a0 = (zero,) * 6
        qdd = []
        for l in range(4):
            rj = tuple(rhs_joints[3 * l + j] for j in range(3))
            qdd.extend(m3_vec(Dinvs[l], rj))
    else:
        # S = A6 − Σ_l B_l Dinv_l B_lᵀ ; t = rhs_base − Σ_l B_l Dinv_l r_l
        m_t, h_t, A_t = A_base
        A6 = [[None] * 6 for _ in range(6)]
        for i in range(3):
            for j in range(3):
                A6[i][j] = A_t[i][j]
        hx = ((0.0, -h_t[2], h_t[1]), (h_t[2], 0.0, -h_t[0]),
              (-h_t[1], h_t[0], 0.0))
        for i in range(3):
            for j in range(3):
                A6[i][3 + j] = hx[i][j]
                A6[3 + i][j] = -hx[i][j]  # (h×)ᵀ = −h×
                A6[3 + i][3 + j] = m_t if i == j else zero
        t6 = list(rhs_base)
        for l in range(4):
            Bl = B_cols[l]              # 3 columns, each v6
            Dinv = Dinvs[l]
            rj = tuple(rhs_joints[3 * l + j] for j in range(3))
            # BDinv columns: (B Dinv)_aj = Σ_c B[a][c] Dinv[c][j]
            BDinv = tuple(tuple(
                sum(Bl[c][a] * Dinv[c][j] for c in range(3))
                for j in range(3)) for a in range(6))
            for a in range(6):
                for b in range(6):
                    A6[a][b] = A6[a][b] - sum(
                        BDinv[a][j] * Bl[j][b] for j in range(3))
                t6[a] = t6[a] - sum(BDinv[a][j] * rj[j] for j in range(3))
        a0 = chol6_solve(tuple(tuple(row) for row in A6), tuple(t6), eps)
        qdd = []
        for l in range(4):
            Bl = B_cols[l]
            rj = tuple(
                rhs_joints[3 * l + j] - v6_dot(Bl[j], a0) for j in range(3))
            qdd.extend(m3_vec(Dinvs[l], rj))

    # ---- pack outputs (API-compatible with dynamics.forward_dynamics) ----
    a0_arr = jnp.stack(a0)
    qdd_arr = jnp.stack(qdd)
    foot_pos_w = jnp.stack([
        jnp.stack(v3_add(pos, m3_vec(R, feet_p[l]))) for l in range(4)])
    foot_vel_w = jnp.stack([jnp.stack(m3_vec(R, feet_v[l])) for l in range(4)])
    info = {
        "foot_pos_world": foot_pos_w,
        "foot_vel_world": foot_vel_w,
        "foot_forces": jnp.stack(fn_list[:4]),
        "feet_in_contact": jnp.stack(in_contact[:4]),
        "contact_force_world": jnp.stack(
            [jnp.stack(f_world[i]) for i in range(4)]),
        "invalid_contact": jnp.any(jnp.stack(in_contact[4:])),
    }
    if new_anchor is not None:
        info["new_anchor"] = jnp.stack(
            [jnp.stack(a) for a in new_anchor])
    return a0_arr, qdd_arr, info
