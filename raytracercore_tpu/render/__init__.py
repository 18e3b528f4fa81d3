from . import camera, film, integrator, renderer, replay  # noqa: F401
from .film import Film  # noqa: F401
from .integrator import trace  # noqa: F401
from .renderer import Renderer, render_pass  # noqa: F401
from .replay import trace_replay  # noqa: F401
