from .tree_kernels import (  # noqa: F401
    permute_states,
    hash_two_to_one,
    tree_root,
    tree_levels,
    merkle_cap,
)
