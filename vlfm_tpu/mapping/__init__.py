from vlfm_tpu.mapping.grid import GridSpec2D  # noqa: F401
