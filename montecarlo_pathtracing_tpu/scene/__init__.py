from .scene import Material, ScenePrimitives, MeshGeometry  # noqa: F401
from .bvh_builder import build_bvh, BVH  # noqa: F401
