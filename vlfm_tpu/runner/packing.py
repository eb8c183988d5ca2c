"""Single-buffer dispatch transport for the streamed farm.

The dev tunnel (and any WAN-attached host) is LATENCY-dominated for the
farm's per-dispatch traffic: a minimal device_put costs ~26 ms RTT and the
unpacked dispatch shipped ~7 separate host arrays up plus 3 computed outputs
back (~2 RTT readback) — measured round 5, scripts/diag_farm_stats.py. This
module packs every host->device field of a dispatch into ONE uint8 buffer
(one put) and the fused program's outputs into ONE f32 array (one get).

Unpacking happens ON DEVICE via static slices + bitcast_convert_type, which
is bit-exact for f32/i32/u16 (verified little-endian on TPU, CPU and the
axon tunnel), so farm results are bit-identical to the unpacked transport —
pinned by tests/test_sim_farm.py::test_packed_transport_bit_identical.

Reference context: this replaces the per-request HTTP encode of
vlfm/vlm/server_wrapper.py:88-164 on the host boundary the TPU serving
system actually has (host->device), where round trips, not bytes, set the
floor on thin links.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np


class Field(NamedTuple):
    name: str
    dtype: str  # numpy dtype name, e.g. "float32"
    shape: Tuple[int, ...]
    offset: int  # bytes, multiple of 4
    nbytes: int


class Layout(NamedTuple):
    fields: Tuple[Field, ...]
    total: int  # buffer bytes

    def field(self, name: str) -> Field:
        for f in self.fields:
            if f.name == name:
                return f
        raise KeyError(name)


def build_layout(specs: Sequence[Tuple[str, str, Tuple[int, ...]]]) -> Layout:
    """specs: (name, numpy dtype name, shape). Offsets are 4-byte aligned so
    every bitcast view starts on an itemsize boundary."""
    fields: List[Field] = []
    off = 0
    for name, dtype, shape in specs:
        nbytes = int(np.dtype(dtype).itemsize * np.prod(shape, dtype=np.int64))
        fields.append(Field(name, dtype, tuple(int(s) for s in shape), off, nbytes))
        off += (nbytes + 3) & ~3
    return Layout(tuple(fields), off)


def pack_views(buf: np.ndarray, layout: Layout) -> Dict[str, np.ndarray]:
    """Writable typed views into a preallocated (total,) uint8 buffer — fill
    these in place each dispatch; no copies beyond the field writes."""
    assert buf.dtype == np.uint8 and buf.shape == (layout.total,)
    return {
        f.name: buf[f.offset:f.offset + f.nbytes].view(f.dtype).reshape(f.shape)
        for f in layout.fields
    }


def unpack_device(layout: Layout, buf):
    """Device-side unpack inside a jitted program: static slices + bitcast.
    Returns {name: jnp array of the field's dtype/shape}. uint8 fields are
    returned as-is (cast bools at the call site)."""
    import jax
    import jax.numpy as jnp

    out = {}
    for f in layout.fields:
        raw = buf[f.offset:f.offset + f.nbytes]
        dt = jnp.dtype(f.dtype)
        if dt == jnp.uint8:
            out[f.name] = raw.reshape(f.shape)
        else:
            out[f.name] = jax.lax.bitcast_convert_type(
                raw.reshape(-1, dt.itemsize), dt
            ).reshape(f.shape)
    return out
