"""Host-side index math for trees and MMRs.

Pure scalar bit-twiddling — this is deliberately host Python (never traced):
the quantities are O(log N) per query and feed kernel launch shapes.

Parity notes (each function cites the reference behaviour it reproduces):

* ``log2_strict``               — plonky2_util::log2_strict; panics (raises)
  on non-powers-of-two (reference simple_merkle_tree.rs:9,30).
* ``get_heights_bitmap_for_mmr_size`` — merkle_mountain_ranges.rs:39-81.
* ``get_mmr_index``             — merkle_mountain_ranges.rs:257-270.
* ``get_standard_index``        — naive_merkle_mountain_ranges.rs:311-334.
* ``get_nr_elms``               — naive_merkle_mountain_ranges.rs:305-308.
"""


def log2_strict(n: int) -> int:
    """Exact log2; raises if ``n`` is not a power of two (panic parity)."""
    if n <= 0 or n & (n - 1):
        raise ValueError(f"{n} is not a power of two")
    return n.bit_length() - 1


def get_heights_bitmap_for_mmr_size(mmr_size: int):
    """Bitmap of peak heights for an MMR with ``mmr_size`` elements, plus the
    height of the next element to be added.

    A subtree whose peak is at height h occupies 2^(h+1) - 1 slots; peaks are
    fitted greedily from the largest subtree that fits downwards.
    """
    if mmr_size == 0:
        return 0, 0
    subtree_size = (1 << mmr_size.bit_length()) - 1
    remaining = mmr_size
    peaks = 0
    while subtree_size > 0:
        peaks <<= 1
        if remaining >= subtree_size:
            peaks |= 1
            remaining -= subtree_size
        subtree_size >>= 1
    return peaks, remaining


def get_mmr_index(leaf_normal_index: int) -> int:
    """Map the k-th inserted leaf (0-based) to its position in the flat
    post-order MMR element array."""
    index = leaf_normal_index
    height = 1
    res = 0
    while index > 0:
        if index & 1:
            res += (1 << height) - 1
        height += 1
        index >>= 1
    return res


def get_nr_elms(nr_leaves: int) -> int:
    """Number of elements of the perfect subtree with ``nr_leaves`` leaves."""
    h = nr_leaves.bit_length() - 1
    return (1 << h) * 2 - 1


def get_standard_index(leaf_index: int, nr_leaves: int) -> int:
    """Map a leaf's MMR (post-order) index within a perfect subtree to its
    ordinary left-to-right leaf ordinal."""
    if nr_leaves in (2, 4):
        return leaf_index if leaf_index in (0, 1) else leaf_index - 1
    nr_elms = get_nr_elms(nr_leaves)
    if leaf_index >= nr_elms // 2:
        return 1 + (nr_leaves - 2) // 2 + get_standard_index(
            leaf_index - (nr_leaves - 1), nr_leaves // 2)
    return get_standard_index(leaf_index, nr_leaves // 2)
