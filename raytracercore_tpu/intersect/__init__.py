from . import dispatch, jnp_ref  # noqa: F401
from .dispatch import HitRecord, closest_hit  # noqa: F401
