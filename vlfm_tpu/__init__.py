"""vlfm_tpu — a TPU-native (JAX/XLA/Pallas) framework for zero-shot semantic
object-goal navigation via Vision-Language Frontier Maps.

Re-designed from scratch for TPU hardware with the capabilities of the
reference system (bdaiinstitute/vlfm): instead of per-request torch HTTP model
servers and per-step NumPy/OpenCV map updates on the CPU, the entire
perception-and-mapping stack runs as one jitted, batched XLA program:

- ``vlfm_tpu.ops``      — the map-update kernels (cone projection, fusion,
                          fog-of-war ray-march, frontier extraction, clustering)
                          as pure jax.numpy / Pallas functions over fixed-shape
                          arrays, vmappable over an episode batch.
- ``vlfm_tpu.mapping``  — functional map state (value / obstacle / object /
                          frontier maps) as pytrees resident in HBM.
- ``vlfm_tpu.models``   — the model stack (BLIP2-ITM, detectors, MobileSAM,
                          PointNav ResNet18+LSTM) as batched XLA inference.
- ``vlfm_tpu.policy``   — the ITM policy state machine, fully device-resident.
- ``vlfm_tpu.parallel`` — mesh/sharding utilities and the batched inference
                          engine replacing the reference's HTTP servers.
- ``vlfm_tpu.runner``   — host-side episode drivers, metrics, logging.
"""

__version__ = "0.1.0"
