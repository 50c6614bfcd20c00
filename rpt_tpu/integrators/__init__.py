from .path import trace_surface, trace_volumetric  # noqa: F401
