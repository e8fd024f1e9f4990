from .mesh import make_mesh, default_mesh  # noqa: F401
from .forest import forest_root, forest_peaks, sharded_forest_step  # noqa: F401
from .dist_ntt import dist_ntt  # noqa: F401
from .runtime import (  # noqa: F401
    init_distributed, global_mesh, make_global_array,
    check_cross_host_agreement, CrossHostDivergence,
)
