"""QuadrupedEnv — functional, jit/vmap/scan-native gym-equivalent.

TPU-native re-design of env/quadruped_gym_env.py: instead of a stateful
gym.Env mutating a PyBullet client, the environment is a pair of pure
functions over an explicit `EnvState` pytree:

    env = QuadrupedEnv(EnvConfig(...))
    state, obs = env.reset(key)
    state, obs, reward, done, info = env.step(state, action)

so thousands of domain-randomized environments batch with `vmap`, roll out
with `lax.scan`, and shard over a device mesh with `shard_map` — replacing
the reference's n_envs=1 SB3 VecEnv (load_model.py:113).

Step semantics mirror quadruped_gym_env.py:227-256: store last action →
optional Butterworth filter → ×action_repeat sub-steps (optional
interpolation → action→command → PD+spring torques → 1 kHz dynamics step)
→ task update → reward → termination (task or sim time > 10 s) →
end-of-episode bonus → noisy sensor obs.

Reset mirrors :278-329: fresh state → randomize scenario → settle 2500
sim steps holding the init reference (skipped when a desired state is
injected, the RSI path) → task/sensor reset.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from flax import struct

from quadruped_springs_tpu.control import interfaces as ci
from quadruped_springs_tpu.env import randomizers as rnd
from quadruped_springs_tpu.models import dynamics as dyn
from quadruped_springs_tpu.models import spatial as sp
from quadruped_springs_tpu.models.go1_params import go1_config
from quadruped_springs_tpu.ops import action_filter as af
from quadruped_springs_tpu.ops import actuation as act
from quadruped_springs_tpu.sensors import sensors as sn
from quadruped_springs_tpu.tasks import tasks as tk

ACTION_EPS = 0.01
OBSERVATION_EPS = 0.01
EPISODE_LENGTH = 10.0  # seconds (quadruped_gym_env.py:35)


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """The six string axes + flags — the reference's entire config surface
    (quadruped_gym_env.py:52-70)."""
    is_rl_gym_interface: bool = True
    time_step: float = 0.001
    action_repeat: int = 10
    motor_control_mode: str = "PD"
    task_env: str = "NO_TASK"
    observation_space_mode: str = "ENCODER"
    action_space_mode: str = "SYMMETRIC"
    on_rack: bool = False
    enable_springs: bool = False
    enable_action_interpolation: bool = False
    enable_action_filter: bool = False
    env_randomizer_mode: str = "GROUND_RANDOMIZER"
    curriculum_level: float = 0.0
    settling_steps: int = 2500
    max_ep_len: float = EPISODE_LENGTH
    obs_noise: bool = True
    # *_DEMO reward normalization. "remaining" is reference-faithful:
    # r / (demo_len - demo_start) (task_base.py:183-211). "full" divides by
    # the full demo length instead — with uniform RSI starts the remaining
    # normalization makes the SAME physical state carry rewards differing
    # by up to demo_len× across episodes (delta=3 vs 185 -> 60x at real
    # demo scale, only 5x in the 40-step hermetic test), which the critic
    # cannot represent (the obs carries no demo index), so GAE advantages
    # acquire a per-episode bias that reinforces late-start (landing/rest)
    # episodes and erodes the launch — the measured round-3 failure mode
    # (probe apex 1.09 -> 0.57 over 100 polish iters). "full" makes the
    # reward a state-action function again; gamma=0.3 already makes
    # episode-length return differences irrelevant.
    demo_norm: str = "remaining"
    # Interface-construction task override. The PD interface raises the
    # rear-thigh upper limits only for task_env == "BACKFLIP" exactly
    # (motor_interface.py:20-22 — BACKFLIP_DEMO / BACKFLIP_PPO do NOT get
    # the raise in the reference either), so actions recorded on the
    # BACKFLIP task scale to DIFFERENT joint targets on the demo/dense
    # tasks. Backflip imitation/fine-tune envs pass iface_task="BACKFLIP"
    # to scale actions identically across the pipeline's stages (the
    # MPCConfig.iface_task precedent). None = use task_env.
    iface_task: str | None = None


@struct.dataclass
class EnvState:
    robot: dyn.RobotState
    task: tk.TaskState
    scenario: rnd.ScenarioParams
    filter_state: af.ButterFilterState
    foot_anchor: jnp.ndarray            # (4,2) stiction anchors (dynamics)
    last_action: jnp.ndarray            # (action_dim,)
    last_filtered_action: jnp.ndarray   # (action_dim,)
    observed_torques: jnp.ndarray       # (12,) PD-clipped motor torques
    spring_torques: jnp.ndarray         # (12,)
    feet_in_contact: jnp.ndarray        # (4,) bool
    feet_forces: jnp.ndarray            # (4,)
    invalid_contact: jnp.ndarray        # () bool
    sim_step_counter: jnp.ndarray       # () int32
    env_step_counter: jnp.ndarray       # () int32
    key: jax.Array


class QuadrupedEnv:
    """Static orchestrator: holds config-derived constants, exposes pure fns."""

    def __init__(self, config: EnvConfig = EnvConfig(),
                 demo_actions: jnp.ndarray | None = None):
        if config.motor_control_mode == "TORQUE" and config.is_rl_gym_interface:
            raise ValueError(
                "TORQUE motor control mode is not supported for the RL gym "
                "interface (quadruped_gym_env.py:167-168)")
        self.config = config
        self.cfg = go1_config(config.enable_springs)
        self.iface = ci.make_interface(
            self.cfg, config.motor_control_mode, config.action_space_mode,
            config.iface_task or config.task_env)
        self.action_dim = self.iface.action_dim
        td = tk.get_task(config.task_env)
        if config.env_randomizer_mode != "NONE" and rnd.is_curriculum(
                config.env_randomizer_mode):
            td = tk.apply_curriculum(td)
        self.task_def = dataclasses.replace(td, max_ep_len=config.max_ep_len)
        self.env_time_step = config.time_step * config.action_repeat
        self.filter_coeffs = af.butter_coeffs(1.0 / self.env_time_step)
        self.sim_params = dyn.default_sim_params(config.time_step, config.on_rack)
        self.suite = config.observation_space_mode
        self.demo_actions = demo_actions
        self.demo_len = None if demo_actions is None else int(demo_actions.shape[0])
        if self.task_def.kind in ("demo", "continuous_demo") and demo_actions is None:
            raise ValueError(f"task {config.task_env} needs demo_actions")
        hi, lo, _ = sn.obs_limits(self.suite, self.cfg)
        self.observation_high = hi + OBSERVATION_EPS
        self.observation_low = lo - OBSERVATION_EPS
        self.obs_dim = int(hi.shape[0])
        # INIT_RACK_POSITION=[0,0,1] vs INIT_POSITION=[0,0,0.32] (configs:22-23)
        self._init_z = 1.0 if config.on_rack else float(self.cfg.init_position[2])

    # ------------------------------------------------------------------
    # helpers
    # ------------------------------------------------------------------
    def _init_robot_state(self) -> dyn.RobotState:
        return dyn.RobotState(
            pos=jnp.array([0.0, 0.0, self._init_z], jnp.float32),
            quat=jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
            lin_vel=jnp.zeros(3, jnp.float32),
            ang_vel=jnp.zeros(3, jnp.float32),
            q=self.cfg.init_joint_angles,
            qd=jnp.zeros(12, jnp.float32),
        )

    def _scenario_sim_params(self, scenario: rnd.ScenarioParams) -> dyn.SimParams:
        return self.sim_params.replace(friction=scenario.friction)

    def _apply_torques(self, model, scenario, robot, q_des, kp=None, kd=None):
        """PD + one-sided springs, per sub-step (quadruped.py:288-321).
        kp/kd override supports the landing wrappers' temporary gain switch
        (landing_wrapper.py:18-36)."""
        kp = self.cfg.motor_kp if kp is None else kp
        kd = self.cfg.motor_kd if kd is None else kd
        tau_m = act.pd_torque(q_des, robot.q, robot.qd, kp, kd,
                              self.cfg.torque_limits)
        if self.config.enable_springs:
            tau_s = act.spring_torque(robot.q, robot.qd, scenario.spring_stiffness,
                                      scenario.spring_damping,
                                      self.cfg.spring_rest_angles)
        else:
            tau_s = jnp.zeros_like(tau_m)
        return tau_m + tau_s, tau_m, tau_s

    def _sensor_ctx(self, state: EnvState) -> sn.SensorContext:
        return sn.make_context(
            state.robot, state.feet_in_contact,
            switched_controller=state.task.switched_controller,
            is_jumping=state.task.is_jumping,
        )

    def _task_ctx(self, state: EnvState, model) -> tk.TaskCtx:
        r = state.robot
        return tk.TaskCtx(
            pos=r.pos, lin_vel=r.lin_vel, rpy=sp.quat_to_rpy(r.quat),
            quat=r.quat, q=r.q, qd=r.qd,
            motor_torques=state.observed_torques,
            feet_in_contact=state.feet_in_contact,
            feet_forces=state.feet_forces,
            invalid_contact=state.invalid_contact,
            sim_time=self.sim_time(state),
            is_flying=~jnp.any(state.feet_in_contact),
            last_action=state.last_action,
            is_fallen_height=self.cfg.is_fallen_height,
        )

    def sim_time(self, state: EnvState) -> jnp.ndarray:
        return state.sim_step_counter.astype(jnp.float32) * self.config.time_step

    # ------------------------------------------------------------------
    # reset (quadruped_gym_env.py:278-329)
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def reset(self, key: jax.Array, desired_robot_state: dyn.RobotState | None = None,
              curriculum_level: jnp.ndarray | None = None,
              demo_start_idx: jnp.ndarray | None = None):
        """Reset. `curriculum_level` (traced, in [0,1]) overrides the static
        EnvConfig.curriculum_level — the runtime hook behind the reference's
        trainer-driven `increase_curriculum_level`
        (env_randomizer_base.py:83-93, quadruped_gym_env.py:423-425): the
        trainer raises its level and passes it here per reset, widening the
        randomization ranges without recompiling."""
        key, k_scen, k_obs = jax.random.split(key, 3)
        level = (self.config.curriculum_level if curriculum_level is None
                 else curriculum_level)
        scenario = rnd.sample_scenario(
            self.cfg, self.config.env_randomizer_mode, k_scen, level)
        model = rnd.model_from_params(scenario)
        params = self._scenario_sim_params(scenario)

        robot = self._init_robot_state()
        # Settling always drives joint-space PD toward the init pose — for RL
        # interfaces via the achievable command projection
        # (interface_base.py:182-200), for TORQUE mode via the temporary PD
        # switch of settle_robot_by_pd (control_interface/utils.py:22-30).
        if self.config.motor_control_mode == "CARTESIAN_PD":
            settle_q_des = ci.action_to_command(
                self.iface, ci.command_to_action(self.iface, self.iface.init_pose))
        elif self.config.motor_control_mode == "TORQUE":
            settle_q_des = self.cfg.init_joint_angles
        else:
            settle_q_des = ci.reference_to_command(self.iface, self.iface.init_pose)

        # stiction anchors start at the current foot ground positions
        p_w0, _, _ = dyn.foot_state_world(model, robot)
        anchor = p_w0[:, :2]
        if desired_robot_state is None:
            def substep(carry, _):
                r, a = carry
                tau, _, _ = self._apply_torques(model, scenario, r, settle_q_des)
                r2, inf = dyn.step(model, params, r, tau,
                                   self.cfg.velocity_limits, foot_anchor=a)
                return (r2, inf["new_anchor"]), None
            # settle does NOT advance the sim counter (interface_base.py:197-199)
            (robot, anchor), _ = jax.lax.scan(
                substep, (robot, anchor), None,
                length=self.config.settling_steps)
        else:
            robot = desired_robot_state
            p_w0, _, _ = dyn.foot_state_world(model, robot)
            anchor = p_w0[:, :2]

        last_action = ci.command_to_action(self.iface, self.iface.init_pose)
        # prime contact/torque info from one dynamics evaluation
        _, _, cinfo = dyn.forward_dynamics(model, params, robot, jnp.zeros(12))
        task_state = tk.init_task_state(self._mk_task_ctx0(robot, cinfo))
        if demo_start_idx is not None:
            # RSI for imitation (reference_state_initialization_wrapper.py):
            # spawning mid-demo must also advance the imitation index so
            # the *_DEMO reward compares against the matching demo action
            task_state = task_state.replace(
                demo_counter=jnp.asarray(demo_start_idx, jnp.int32),
                demo_start=jnp.asarray(demo_start_idx, jnp.int32))
        state = EnvState(
            robot=robot,
            task=task_state,
            scenario=scenario,
            filter_state=af.filter_reset(self.action_dim, last_action),
            foot_anchor=anchor,
            last_action=last_action,
            last_filtered_action=last_action,
            observed_torques=jnp.zeros(12),
            spring_torques=jnp.zeros(12),
            feet_in_contact=cinfo["feet_in_contact"],
            feet_forces=cinfo["foot_forces"],
            invalid_contact=cinfo["invalid_contact"],
            sim_step_counter=jnp.asarray(0, jnp.int32),
            env_step_counter=jnp.asarray(0, jnp.int32),
            key=key,
        )
        obs = self._observe(state, k_obs)
        return state, obs

    def _mk_task_ctx0(self, robot, cinfo) -> tk.TaskCtx:
        return tk.TaskCtx(
            pos=robot.pos, lin_vel=robot.lin_vel, rpy=sp.quat_to_rpy(robot.quat),
            quat=robot.quat, q=robot.q, qd=robot.qd,
            motor_torques=jnp.zeros(12),
            feet_in_contact=cinfo["feet_in_contact"],
            feet_forces=cinfo["foot_forces"],
            invalid_contact=jnp.asarray(False),
            sim_time=jnp.asarray(0.0, jnp.float32),
            is_flying=~jnp.any(cinfo["feet_in_contact"]),
            last_action=jnp.zeros(self.action_dim),
            is_fallen_height=self.cfg.is_fallen_height,
        )

    # ------------------------------------------------------------------
    # step (quadruped_gym_env.py:227-256)
    # ------------------------------------------------------------------
    @partial(jax.jit, static_argnums=0)
    def step(self, state: EnvState, action: jnp.ndarray, kp=None, kd=None,
             ext_force_world: jnp.ndarray | None = None):
        """One 100 Hz control step. `ext_force_world` (3,) applies a world-
        frame perturbation force at the trunk origin during every sub-step —
        the env-level surface of apply_external_force (quadruped.py:338-343,
        reference call site quadruped_gym_env.py:215 randomize_step)."""
        model = rnd.model_from_params(state.scenario)
        params = self._scenario_sim_params(state.scenario)
        cfgc = self.config

        curr = action
        filt_state = state.filter_state
        if cfgc.enable_action_filter:
            filt_state, curr = af.filter_step(self.filter_coeffs, filt_state, curr)

        prev = (state.last_filtered_action if cfgc.enable_action_filter
                else state.last_action)

        def substep(carry, i):
            robot, anchor = carry
            if cfgc.enable_action_interpolation:
                frac = (i.astype(jnp.float32) + 1.0) / cfgc.action_repeat
                a = prev + frac * (curr - prev)
            else:
                a = curr
            q_des = ci.action_to_command(self.iface, a) if cfgc.is_rl_gym_interface else a
            if cfgc.is_rl_gym_interface or cfgc.motor_control_mode != "TORQUE":
                tau, tau_m, tau_s = self._apply_torques(model, state.scenario,
                                                        robot, q_des, kp, kd)
            else:
                tau_m = act.torque_command(q_des, self.cfg.torque_limits)
                tau_s = jnp.zeros_like(tau_m)
                if cfgc.enable_springs:
                    tau_s = act.spring_torque(
                        robot.q, robot.qd, state.scenario.spring_stiffness,
                        state.scenario.spring_damping, self.cfg.spring_rest_angles)
                tau = tau_m + tau_s
            robot2, info = dyn.step(model, params, robot, tau,
                                    self.cfg.velocity_limits,
                                    ext_force_world=ext_force_world,
                                    foot_anchor=anchor)
            out = (info["feet_in_contact"], info["foot_forces"],
                   info["invalid_contact"], tau_m, tau_s)
            return (robot2, info["new_anchor"]), out

        (robot, anchor), (contacts, forces, invalids, tau_ms, tau_ss) = (
            jax.lax.scan(substep, (state.robot, state.foot_anchor),
                         jnp.arange(cfgc.action_repeat)))

        state = state.replace(
            robot=robot,
            foot_anchor=anchor,
            filter_state=filt_state,
            # last_filtered_action is the action actually applied this step
            # (== raw action when the filter is disabled) — the reference's
            # get_last_filtered_action(), recorded into demo rows
            # (get_demonstration_wrapper.py:36-40).
            last_action=action,
            last_filtered_action=curr,
            observed_torques=tau_ms[-1],
            spring_torques=tau_ss[-1],
            feet_in_contact=contacts[-1],
            feet_forces=forces[-1],
            invalid_contact=invalids[-1],
            sim_step_counter=state.sim_step_counter + cfgc.action_repeat,
            env_step_counter=state.env_step_counter + 1,
        )

        ctx = self._task_ctx(state, model)
        task_state = tk.task_on_step(self.task_def, state.task, ctx)
        state = state.replace(task=task_state)
        reward = tk.task_reward(self.task_def, task_state, ctx,
                                self.demo_actions, self.demo_len,
                                demo_norm=self.config.demo_norm)
        task_term = tk.task_terminated(self.task_def, task_state, ctx, self.demo_len)
        timeout = self.sim_time(state) > cfgc.max_ep_len
        done = task_term | timeout
        reward = reward + jnp.where(
            done, tk.task_reward_end(self.task_def, task_state, ctx), 0.0)

        key, k_obs = jax.random.split(state.key)
        state = state.replace(key=key)
        obs = self._observe(state, k_obs)
        info = {
            "task_terminated": task_term,
            "timeout": timeout,
            "max_height": task_state.relative_max_height,
            "max_fwd": task_state.max_forward_distance,
            "feet_forces": state.feet_forces,
            "switched_controller": task_state.switched_controller,
            # knot-mean motor torque (the control step's torque impulse /
            # dt) — the physics-fidelity gate compares THIS against the
            # LCP oracle: instantaneous end-of-knot samples alias the
            # ~40-150 rad/s PD transients after command switches, whose
            # phase no two contact solvers share (utils/verification.py).
            "mean_motor_torque": jnp.mean(tau_ms, axis=0),
        }
        return state, obs, reward, done, info

    def _observe(self, state: EnvState, key: jax.Array) -> jnp.ndarray:
        ctx = self._sensor_ctx(state)
        if self.config.obs_noise:
            return sn.read_noisy_obs(self.suite, self.cfg, ctx, key)
        return sn.read_obs(self.suite, ctx)

    # ------------------------------------------------------------------
    # conveniences mirroring the reference getters
    # ------------------------------------------------------------------
    def get_landing_action(self):
        return ci.landing_action(self.iface)

    def get_settling_action(self):
        return ci.settling_action(self.iface)

    def get_init_action(self):
        return ci.command_to_action(self.iface, self.iface.init_pose)
