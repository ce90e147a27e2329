"""Simulation plants for closed-loop runs.

The reference validates in Gazebo with the sq2_ccv robot; the framework's
equivalent is a device-resident plant: the same dynamics family as the
controller (or a perturbed copy, for model-mismatch studies) driven by the
actuated command u[0] each cycle, with optional process noise.
"""

from __future__ import annotations

import dataclasses


import jax

from ccv_mppi_path_tracker_tpu.models.registry import get_model


@dataclasses.dataclass(frozen=True)
class Plant:
    """A plant = model step + control gains + additive process noise.

    control_gain scales the applied controls (e.g. 0.9 simulates actuator
    droop for system-ID experiments); process_noise is the per-state-dim
    std-dev of additive Gaussian noise.
    """

    model_name: str
    control_gain: float = 1.0
    process_noise: float = 0.0
    substeps: int = 1

    def step(self, key, state, u, dt):
        m = get_model(self.model_name)
        u = u * self.control_gain
        sub_dt = dt / self.substeps
        for _ in range(self.substeps):
            state = m.step(state, u, sub_dt)
        if self.process_noise:
            state = state + self.process_noise * jax.random.normal(
                key, state.shape, state.dtype
            )
        return state
