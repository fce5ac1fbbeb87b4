"""2-D frame transforms and angle utilities.

Replaces the reference's inline world->robot rotation
(/root/reference/mpc_ros/src/driving_state.cpp:196-207) and
`normalizeAngle` (/root/reference/mpc_ros/include/driving_state.h:32-40).
Vectorized over waypoints and batchable over scenarios.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def world_to_robot(xs: jnp.ndarray, ys: jnp.ndarray,
                   px, py, theta) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Transform world points into the robot frame at pose (px, py, theta).

    Matches /root/reference/mpc_ros/src/driving_state.cpp:202-207:
      x_veh =  dx cos(theta) + dy sin(theta)
      y_veh =  dy cos(theta) - dx sin(theta)
    """
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    dx = xs - px
    dy = ys - py
    return dx * c + dy * s, dy * c - dx * s


def robot_to_world(xr: jnp.ndarray, yr: jnp.ndarray,
                   px, py, theta) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Inverse of `world_to_robot` (used to publish the predicted horizon
    back in the world frame)."""
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    return px + xr * c - yr * s, py + xr * s + yr * c


def normalize_angle(angle, amin=-math.pi, amax=math.pi):
    """Wrap `angle` into [amin, amax) — branchless analog of the reference's
    fmod-based normalizeAngle (/root/reference/mpc_ros/include/driving_state.h:32-40).
    """
    span = amax - amin
    return angle - span * jnp.floor((angle - amin) / span)


def angle_diff(a, b):
    """Shortest signed angular difference a - b, wrapped to [-pi, pi)."""
    return normalize_angle(a - b)
