"""Poseidon-Goldilocks parameters (width 12, alpha 7, 8 full + 22 partial rounds).

The 360 round constants are regenerated from first principles: plonky2 0.1.3
sampled them uniformly from [0, p) with ``ChaCha8Rng::seed_from_u64(0)`` and
rand 0.8's widening-multiply (Lemire) range sampler.  We re-implement that
exact pipeline (ChaCha8 stream cipher, rand_core's PCG32-based seed expansion,
Lemire rejection) in pure Python, which reproduces plonky2's
``ALL_ROUND_CONSTANTS`` table bit-for-bit — verified end-to-end against the
golden Merkle digests recorded in the reference's tests
(/root/reference/src/simple_merkle_tree/simple_merkle_tree.rs:131-191).

The MDS matrix is the hand-picked circulant-plus-diagonal Goldilocks matrix
with tiny entries (every entry fits in 6 bits), which keeps the MDS layer on
cheap vector-lane constant multiplies instead of full 64-bit field products.
"""

from functools import lru_cache

GOLDILOCKS_P = (1 << 64) - (1 << 32) + 1  # reference src/mmr/common.rs:3
_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

WIDTH = 12
RATE = 8
CAPACITY = 4
FULL_ROUNDS = 8  # 4 at the start + 4 at the end
PARTIAL_ROUNDS = 22
N_ROUNDS = FULL_ROUNDS + PARTIAL_ROUNDS  # 30
HALF_FULL_ROUNDS = FULL_ROUNDS // 2
ALPHA = 7

# Circulant part of the MDS matrix: mds[r][c] = CIRC[(c - r) % 12], plus
# DIAG[r] on the diagonal.
MDS_MATRIX_CIRC = (17, 15, 41, 16, 2, 28, 13, 13, 39, 18, 34, 20)
MDS_MATRIX_DIAG = (8,) + (0,) * 11


def _seed_from_u64(state: int, n_bytes: int = 32) -> bytes:
    """rand_core 0.6 ``SeedableRng::seed_from_u64`` (PCG32 seed expansion)."""
    mul = 6364136223846793005
    inc = 11634580027462260723
    out = bytearray()
    while len(out) < n_bytes:
        state = (state * mul + inc) & _M64
        xorshifted = (((state >> 18) ^ state) >> 27) & _M32
        rot = state >> 59
        word = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & _M32
        out += word.to_bytes(4, "little")
    return bytes(out[:n_bytes])


def _chacha_block(key_words, counter, rounds=8):
    def rotl(x, n):
        return ((x << n) | (x >> (32 - n))) & _M32

    consts = [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574]
    init = consts + key_words + [counter & _M32, (counter >> 32) & _M32, 0, 0]
    ws = init[:]

    def quarter(a, b, c, d):
        ws[a] = (ws[a] + ws[b]) & _M32; ws[d] = rotl(ws[d] ^ ws[a], 16)
        ws[c] = (ws[c] + ws[d]) & _M32; ws[b] = rotl(ws[b] ^ ws[c], 12)
        ws[a] = (ws[a] + ws[b]) & _M32; ws[d] = rotl(ws[d] ^ ws[a], 8)
        ws[c] = (ws[c] + ws[d]) & _M32; ws[b] = rotl(ws[b] ^ ws[c], 7)

    for _ in range(rounds // 2):
        quarter(0, 4, 8, 12); quarter(1, 5, 9, 13)
        quarter(2, 6, 10, 14); quarter(3, 7, 11, 15)
        quarter(0, 5, 10, 15); quarter(1, 6, 11, 12)
        quarter(2, 7, 8, 13); quarter(3, 4, 9, 14)
    return [(w + s) & _M32 for w, s in zip(ws, init)]


class _ChaCha8Rng:
    def __init__(self, seed_u64: int):
        seed = _seed_from_u64(seed_u64)
        self._key = [int.from_bytes(seed[i * 4:i * 4 + 4], "little") for i in range(8)]
        self._counter = 0
        self._buf = []

    def next_u32(self) -> int:
        if not self._buf:
            self._buf = _chacha_block(self._key, self._counter)
            self._counter += 1
        return self._buf.pop(0)

    def next_u64(self) -> int:
        lo = self.next_u32()
        return lo | (self.next_u32() << 32)

    def gen_range_u64(self, bound: int) -> int:
        """rand 0.8 ``Rng::gen_range(0..bound)`` for a full-width bound."""
        assert bound > 1 << 63  # leading_zeros == 0, zone == bound - 1
        zone = bound - 1
        while True:
            v = self.next_u64()
            wide = v * bound
            if wide & _M64 <= zone:
                return wide >> 64


@lru_cache(maxsize=None)
def all_round_constants() -> tuple:
    """The 360 Goldilocks round constants, ``ALL_ROUND_CONSTANTS[12*round + lane]``."""
    rng = _ChaCha8Rng(0)
    return tuple(rng.gen_range_u64(GOLDILOCKS_P) for _ in range(N_ROUNDS * WIDTH))


@lru_cache(maxsize=None)
def mds_matrix() -> tuple:
    """Full 12x12 MDS matrix rows (python ints)."""
    rows = []
    for r in range(WIDTH):
        row = [MDS_MATRIX_CIRC[(c - r) % WIDTH] for c in range(WIDTH)]
        row[r] += MDS_MATRIX_DIAG[r]
        rows.append(tuple(row))
    return tuple(rows)
