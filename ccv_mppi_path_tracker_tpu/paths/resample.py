"""Global-path buffer and in-jit horizon resampling.

Replaces the reference's ROS ``nav_msgs::Path`` subscription plus
``get_CurrentIndex``/``calc_RefPath`` (src/diff_drive_mppi.cpp:126-181) with a
device-resident, statically-shaped buffer: the course is padded to a fixed
capacity with a ``num_valid`` scalar, so the whole resampling step runs inside
jit with no recompiles when the course changes length.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ccv_mppi_path_tracker_tpu.core.types import RefWindow
from ccv_mppi_path_tracker_tpu.ops.mindist import DIST_CAP


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass
class PathBuffer:
    """A statically-shaped global reference path.

    xy: (N_max, 2) points; entries beyond num_valid are padding (copies of the
        last valid point, so clamped gathers are safe).
    num_valid: () int32.
    resolution: () arc-length spacing the course was sampled at — the
        reference's ``resolution`` param (src/diff_drive_mppi.cpp:29) used for
        the index step in calc_RefPath (:160).
    """

    xy: jax.Array
    num_valid: jax.Array
    resolution: jax.Array

    @staticmethod
    def from_points(points, resolution, capacity=None, dtype=np.float32):
        points = np.asarray(points, dtype=dtype)
        n = points.shape[0]
        if capacity is None:
            capacity = n
        assert capacity >= n and n >= 2
        pad = np.repeat(points[-1:], capacity - n, axis=0)
        return PathBuffer(
            xy=np.concatenate([points, pad], axis=0),
            num_valid=np.asarray(n, np.int32),
            resolution=np.asarray(resolution, dtype),
        )


def nearest_index(path: PathBuffer, pos):
    """Index of the nearest path point to ``pos`` (get_CurrentIndex,
    src/diff_drive_mppi.cpp:126-140). Reference quirk preserved: the search
    starts from min_distance = 100.0, so if every point is farther than 100 m
    the index stays 0."""
    diff = path.xy - pos
    d2 = jnp.sum(diff * diff, axis=-1)
    idx = jnp.arange(d2.shape[0])
    d2 = jnp.where(idx < path.num_valid, d2, jnp.inf)
    best = jnp.argmin(d2)
    cap2 = jnp.asarray(DIST_CAP * DIST_CAP, d2.dtype)
    return jnp.where(d2[best] < cap2, best, 0).astype(jnp.int32)


def resample_reference(path: PathBuffer, pos, v_ref, dt, horizon: int) -> RefWindow:
    """Resample the horizon-length local reference (calc_RefPath,
    src/diff_drive_mppi.cpp:156-181).

    Index i maps to path point ``current + floor(i * v_ref*dt/resolution)``
    (the C++ truncates the double product on int assignment, :160-163),
    clamped to the last valid point. yaw[i] is the heading of segment
    i -> i+1; the final entry (left stale by the reference) is set to its
    neighbor's value.
    """
    cur = nearest_index(path, pos)
    step = v_ref * dt / path.resolution
    path_xy = jnp.asarray(path.xy)  # path may be a closed-over NumPy constant
    offs = jnp.floor(jnp.arange(horizon, dtype=path_xy.dtype) * step).astype(
        jnp.int32
    )
    idx = jnp.minimum(cur + offs, path.num_valid - 1)
    xy = path_xy[idx]
    seg = xy[1:] - xy[:-1]
    yaw = jnp.arctan2(seg[:, 1], seg[:, 0])
    yaw = jnp.concatenate([yaw, yaw[-1:]])
    return RefWindow(xy=xy, yaw=yaw)
