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

    interp = v3.slerp if slerp else (lambda a, b, tt: v3.lerp(tt, a, b))
    if slerp:
        pos = v3.slerp(track.position[i0], track.position[i1], t)
        rot = v3.slerp(track.rotation[i0], track.rotation[i1], t)
        scl = v3.slerp(track.scale[i0], track.scale[i1], t)
    else:
        pos = v3.lerp(t, track.position[i0], track.position[i1])
        rot = v3.lerp(t, track.rotation[i0], track.rotation[i1])
        scl = v3.lerp(t, track.scale[i0], track.scale[i1])
    return TRS(pos, rot, scl)
