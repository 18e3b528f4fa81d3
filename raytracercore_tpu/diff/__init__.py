from .params import (MATERIAL_FIELDS, get_material_params,  # noqa: F401
                     with_material_params)
