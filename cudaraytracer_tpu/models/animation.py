"""Keyframe TRS animation — parity with hitable/animationData.h.

The reference's keyframe system (KeyFrame / KeyFrameList / AnimationData) is
vestigial — not referenced by the active pipeline — but part of the component
inventory.  ``AnimationData::Get_NextTransform`` (animationData.h:68-90) lerps
position/rotation/scale between the current keyframe and the next (the SLerp
variants are commented out in the reference; both are provided here).

TPU-native form: keyframes are arrays (frames int32[K], TRS stacked f32[K,3]);
evaluation at an arbitrary frame is a vectorized searchsorted + lerp, jittable
and differentiable, and evaluates whole batches of animations at once.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..core import vec as v3
from .transform import TRS

Array = jnp.ndarray


class KeyframeTrack(NamedTuple):
    frames: Array     # int32[K], ascending
    position: Array   # f32[K,3]
    rotation: Array   # f32[K,3] Euler degrees
    scale: Array      # f32[K,3]

    @property
    def n_keys(self) -> int:
        return self.frames.shape[0]


def make_track(keyframes) -> KeyframeTrack:
    """keyframes: iterable of (frame, position, rotation, scale)."""
    ks = sorted(keyframes, key=lambda k: k[0])
    f = np.asarray([k[0] for k in ks], np.int32)
    p = np.asarray([k[1] for k in ks], np.float32)
    r = np.asarray([k[2] for k in ks], np.float32)
    s = np.asarray([k[3] for k in ks], np.float32)
    return KeyframeTrack(jnp.asarray(f), jnp.asarray(p), jnp.asarray(r),
                         jnp.asarray(s))


def evaluate(track: KeyframeTrack, frame, slerp: bool = False) -> TRS:
    """Transform at `frame` (scalar or batched): linear interpolation between
    the surrounding keyframes, clamped at the ends (the reference returns the
    current keyframe's transform past the last key, animationData.h:70-74)."""
    frame = jnp.asarray(frame, jnp.float32)
    idx = jnp.searchsorted(track.frames.astype(jnp.float32), frame,
                           side="right") - 1
    i0 = jnp.clip(idx, 0, track.n_keys - 1)
    i1 = jnp.clip(idx + 1, 0, track.n_keys - 1)
    f0 = track.frames[i0].astype(jnp.float32)
    f1 = track.frames[i1].astype(jnp.float32)
    denom = jnp.where(f1 > f0, f1 - f0, 1.0)
    t = jnp.clip((frame - f0) / denom, 0.0, 1.0)   # animationData.h:79

    if slerp:
        pos = _slerp_guarded(track.position[i0], track.position[i1], t)
        rot = _slerp_guarded(track.rotation[i0], track.rotation[i1], t)
        scl = _slerp_guarded(track.scale[i0], track.scale[i1], t)
    else:
        pos = v3.lerp(t, track.position[i0], track.position[i1])
        rot = v3.lerp(t, track.rotation[i0], track.rotation[i1])
        scl = v3.lerp(t, track.scale[i0], track.scale[i1])
    return TRS(pos, rot, scl)


def _slerp_guarded(a: Array, b: Array, t) -> Array:
    """v3.slerp (vec3.h:219-232) wherever it is defined, falling back to
    lerp where it is degenerate: identical keys (sin theta = 0 — every held
    pose) or a (near-)zero key like the default (0,0,0) rotation.  The raw
    reference formula divides by both, which would NaN the whole track;
    double-where keeps values AND gradients finite."""
    t = jnp.asarray(t, jnp.float32)
    sa = jnp.sum(a * a, axis=-1)
    sb = jnp.sum(b * b, axis=-1)
    ok_len = (sa > 1e-16) & (sb > 1e-16)
    # sqrt input also double-where'd: d(sqrt)/dx at 0 is inf, and inf times
    # the rejected branch's zero cotangent is NaN
    la = jnp.sqrt(jnp.where(ok_len, sa, 1.0))
    lb = jnp.sqrt(jnp.where(ok_len, sb, 1.0))
    na = a / la[..., None]
    nb = b / lb[..., None]
    theta = jnp.arccos(jnp.clip(jnp.sum(na * nb, axis=-1), -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    ok = ok_len & (sin_theta > 1e-6)
    safe_sin = jnp.where(ok, sin_theta, 1.0)
    direction = (jnp.sin((1.0 - t) * theta)[..., None] * na
                 + jnp.sin(t * theta)[..., None] * nb) / safe_sin[..., None]
    mag = (lb - la) * t + la
    return jnp.where(ok[..., None], mag[..., None] * direction,
                     v3.lerp(t, a, b))
