"""Generating Burgers trajectories with the built-in RK4 solver.

Counterpart of reference examples/data_gen/plot_burgers_2d_solver.py:
solves u_t + u u_x = nu u_xx from random sine initial conditions and
records the full (t, x) space-time field used for PINO training.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent.parent))

import numpy as np

from neuraloperator_tpu.data.datasets.synthetic import (
    solve_burgers_trajectory,
)

rng = np.random.default_rng(0)
n = 64
grid = np.linspace(0, 2 * np.pi, n, endpoint=False)
coef = rng.standard_normal(5) / np.arange(1, 6)
u0 = sum(c * np.sin((i + 1) * grid) for i, c in enumerate(coef)).astype(
    np.float32
)

traj = solve_burgers_trajectory(u0, visc=0.05, nt=8,
                                steps_per_frame=200)
print("space-time field:", traj.shape)  # (nt, nx)
print("energy decay:",
      [round(float((f ** 2).mean()), 4) for f in traj[::2]])
