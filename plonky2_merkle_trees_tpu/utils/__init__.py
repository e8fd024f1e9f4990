from .index_math import (  # noqa: F401
    log2_strict,
    get_heights_bitmap_for_mmr_size,
    get_mmr_index,
    get_standard_index,
    get_nr_elms,
)
