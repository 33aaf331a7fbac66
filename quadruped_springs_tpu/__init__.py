"""quadruped_springs_tpu: TPU-native MPC / trajectory-optimization framework
for the Unitree Go1 quadruped with Parallel Elastic Actuators (PEA).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`francescovezzi/quadruped-springs` (PyBullet + gym): analytic rigid-body
dynamics, spring/contact kernels, task cost models, vmapped/pjit-batched
iLQR solves, and a functional gym-compatible environment.
"""

__version__ = "0.1.0"
