from .bvh import FlatBVH, build_bvh  # noqa: F401
