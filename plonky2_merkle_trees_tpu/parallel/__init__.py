from .mesh import make_mesh, default_mesh  # noqa: F401
from .forest import forest_root, forest_peaks, sharded_forest_step  # noqa: F401
from .dist_ntt import dist_ntt  # noqa: F401
