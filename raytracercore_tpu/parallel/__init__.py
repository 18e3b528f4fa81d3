from . import mesh, shard  # noqa: F401
from .mesh import make_mesh, ray_sharded, replicated  # noqa: F401
from .shard import (make_sharded_render_pass, make_train_step,  # noqa: F401
                    place_film, place_scene)
