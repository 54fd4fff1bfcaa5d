"""Sources: deterministic synthetic fixture generators and IO helpers."""

from geodata_ray.sources import synth  # noqa: F401
