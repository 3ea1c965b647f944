"""SAE time surface — per-pixel last-event timestamp plane.

Reference: Metavision::MostRecentTimestampBuffer updated per event under a
mutex (`time_surface.at(ev->y, ev->x) = ev->t`, event-cam-tracking/
event-cam-fast-corner-tracker/metavision_time_surface.cpp:101-117 and
metavision_time_surface_periodic_group_track.cpp:921-923), rendered with
`generate_img_time_surface(last_time, delta_ts=10000, img)`.

TPU formulation: last-write-wins per pixel over a time-sorted stream is
exactly scatter-max of timestamps (timestamps are nondecreasing in stream
order), which XLA lowers to a deterministic scatter. Timestamps are int32
microseconds relative to the stream start (wraps after ~35.8 min — callers
rebase long streams per window).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SensorConfig


def init_sae(sensor: SensorConfig = SensorConfig(), dtype=jnp.int32) -> jnp.ndarray:
    """(H, W) zero surface — time_surface.set_to(0) (group_track.cpp:787)."""
    return jnp.zeros((sensor.height, sensor.width), dtype=dtype)


def update_sae(
    sae: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    t: jnp.ndarray,
    valid: jnp.ndarray,
) -> jnp.ndarray:
    """Scatter-max one slice of events into the surface.

    Equivalent to the reference's sequential per-event `at(y,x)=t` because t is
    nondecreasing in stream order; ties resolve to the same value.
    """
    t = t.astype(sae.dtype)
    tval = jnp.where(valid, t, jnp.iinfo(sae.dtype).min
                     if jnp.issubdtype(sae.dtype, jnp.integer) else -jnp.inf)
    return sae.at[y, x].max(tval, mode="drop")


def last_time(t: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Latest valid timestamp of the slice (reference tracks `last_time`)."""
    return jnp.max(jnp.where(valid, t, jnp.iinfo(t.dtype).min
                             if jnp.issubdtype(t.dtype, jnp.integer) else -jnp.inf))


def render_time_surface(
    sae: jnp.ndarray, last_t: jnp.ndarray, delta_ts: int = 10_000
) -> jnp.ndarray:
    """Grayscale render — generate_img_time_surface semantics: pixels with
    t in (last_t - delta_ts, last_t] ramp 0..255, older pixels are 0."""
    age = last_t.astype(jnp.float32) - sae.astype(jnp.float32)
    val = 255.0 * (1.0 - age / float(delta_ts))
    val = jnp.where((sae > 0) & (age < delta_ts), val, 0.0)
    return jnp.clip(val, 0.0, 255.0).astype(jnp.uint8)
