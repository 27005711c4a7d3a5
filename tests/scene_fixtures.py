from lajolla_tpu.testing import (MATERIAL_XML_TYPES, make_single_material_scene,
                                 quad_mesh)  # noqa: F401
