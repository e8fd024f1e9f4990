"""Index-math unit tests — deterministic tables straight from the reference
(merkle_mountain_ranges.rs:278-328, naive_merkle_mountain_ranges.rs:459-552)."""

import pytest

from plonky2_merkle_trees_tpu.utils.index_math import (
    log2_strict, get_heights_bitmap_for_mmr_size, get_mmr_index,
    get_standard_index, get_nr_elms,
)


def test_heights_bitmap_table():
    # (mmr_size, expected bitmap) — reference merkle_mountain_ranges.rs:278-303
    table = [(1, 1), (3, 2), (4, 3), (7, 4), (10, 6), (15, 8), (22, 12),
             (25, 14), (26, 15), (31, 16), (32, 17), (34, 18), (35, 19),
             (38, 20), (41, 22), (42, 23)]
    for mmr_size, bitmap in table:
        got_bitmap, got_pos = get_heights_bitmap_for_mmr_size(mmr_size)
        assert got_bitmap == bitmap
        assert got_pos == 0
    assert get_heights_bitmap_for_mmr_size(0) == (0, 0)


def test_get_mmr_index_table():
    # reference merkle_mountain_ranges.rs:305-328
    table = [(0, 0), (1, 1), (2, 3), (3, 4), (4, 7), (5, 8), (6, 10), (7, 11),
             (8, 15), (9, 16), (10, 18), (11, 19), (12, 22), (13, 23),
             (14, 25), (15, 26)]
    for normal, mmr_idx in table:
        assert get_mmr_index(normal) == mmr_idx


@pytest.mark.parametrize("nr_leaves,pairs", [
    (4, [(0, 0), (1, 1), (3, 2), (4, 3)]),
    (8, [(0, 0), (1, 1), (3, 2), (4, 3), (7, 4), (8, 5), (10, 6), (11, 7)]),
    (16, [(0, 0), (1, 1), (3, 2), (4, 3), (7, 4), (8, 5), (10, 6), (11, 7),
          (15, 8), (16, 9), (18, 10), (19, 11), (22, 12), (23, 13), (25, 14), (26, 15)]),
    (32, [(0, 0), (1, 1), (3, 2), (4, 3), (7, 4), (8, 5), (10, 6), (11, 7),
          (15, 8), (16, 9), (18, 10), (19, 11), (22, 12), (23, 13), (25, 14), (26, 15),
          (31, 16), (32, 17), (34, 18), (35, 19), (38, 20), (39, 21), (41, 22), (42, 23)]),
])
def test_get_standard_index(nr_leaves, pairs):
    # reference naive_merkle_mountain_ranges.rs:459-552
    for mmr_idx, std_idx in pairs:
        assert get_standard_index(mmr_idx, nr_leaves) == std_idx


def test_standard_index_inverts_mmr_index():
    # get_standard_index is the inverse of get_mmr_index inside a perfect tree.
    for log_n in (1, 2, 3, 4, 5, 6):
        n = 1 << log_n
        for k in range(n):
            assert get_standard_index(get_mmr_index(k), n) == k


def test_log2_strict():
    assert log2_strict(1) == 0
    assert log2_strict(1024) == 10
    for bad in (0, 3, 12, -4):
        with pytest.raises(ValueError):
            log2_strict(bad)


def test_get_nr_elms():
    assert get_nr_elms(2) == 3
    assert get_nr_elms(4) == 7
    assert get_nr_elms(16) == 31
