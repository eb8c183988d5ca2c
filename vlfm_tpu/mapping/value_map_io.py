"""Value-map record/replay: the golden-trace regression harness.

Parity target: the RECORD_VALUE_MAP / PLAY_VALUE_MAP machinery in
vlfm/mapping/value_map.py:26-30,77-94,130-144,448-481 — record every
update_map input (depth png + values/tf/depth-range/fov json) during a run,
then replay them step-for-step to diff kernel behaviour across versions.

The same env vars are honoured. Depth is stored as 16-bit png (the reference
uses 8-bit, losing ~0.02 m of depth resolution; replays of our own
recordings are exact to 1/65535).
"""

from __future__ import annotations

import json
import os
import os.path as osp
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np

RECORDING_DIR_ENV = "RECORD_VALUE_MAP_DIR"
DEFAULT_DIR = "value_map_recordings"


class ValueMapRecorder:
    def __init__(self, directory: Optional[str] = None, kwargs: Optional[dict] = None):
        self.dir = directory or os.environ.get(RECORDING_DIR_ENV, DEFAULT_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self._idx = 0
        self._data = {}
        if kwargs is not None:
            with open(osp.join(self.dir, "kwargs.json"), "w") as f:
                json.dump(kwargs, f)

    def record(self, values, depth, tf_camera_to_episodic, min_depth, max_depth, fov) -> None:
        name = f"{self._idx:04d}.png"
        cv2.imwrite(
            osp.join(self.dir, name),
            (np.asarray(depth) * 65535).astype(np.uint16),
        )
        self._data[name] = {
            "values": np.asarray(values).tolist(),
            "tf_camera_to_episodic": np.asarray(tf_camera_to_episodic).tolist(),
            "min_depth": float(min_depth),
            "max_depth": float(max_depth),
            "fov": float(fov),
        }
        self._idx += 1
        with open(osp.join(self.dir, "data.json"), "w") as f:
            json.dump(self._data, f)


def iter_recording(directory: str) -> Iterator[Tuple[np.ndarray, dict]]:
    """Yield (depth, meta) per recorded frame, in recording order."""
    with open(osp.join(directory, "data.json")) as f:
        data = json.load(f)
    for name in sorted(data.keys()):
        img = cv2.imread(osp.join(directory, name), cv2.IMREAD_UNCHANGED)
        if img.dtype == np.uint16:
            depth = img.astype(np.float32) / 65535.0
        else:
            depth = img.astype(np.float32) / 255.0
        yield depth, data[name]


def replay(directory: str, spec=None, value_channels: Optional[int] = None):
    """Re-run a recording through the current kernels; returns final state."""
    import jax.numpy as jnp

    from vlfm_tpu.mapping import value_map as VM
    from vlfm_tpu.mapping.grid import GridSpec2D

    spec = spec or GridSpec2D()
    frames = list(iter_recording(directory))
    if value_channels is None:
        value_channels = len(frames[0][1]["values"]) if frames else 1
    state = VM.create(spec, value_channels)
    for depth, meta in frames:
        state = VM.update(
            state,
            spec,
            jnp.asarray(meta["values"]),
            jnp.asarray(depth),
            jnp.asarray(meta["tf_camera_to_episodic"]),
            float(meta["min_depth"]),
            float(meta["max_depth"]),
            float(meta["fov"]),
        )
    return state
