from .sphere_sweep import sphere_sweep, sphere_sweep_available  # noqa: F401
