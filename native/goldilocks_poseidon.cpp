// Native host-side Goldilocks + Poseidon kernels.
//
// The TPU owns the batched hashing; this library covers the host's
// sequential hot loops (MMR appends, Fiat-Shamir transcripts, Merkle-path
// replay in the verifier) where Python-int arithmetic is the bottleneck.
// Round constants and the MDS matrix are injected from Python at init so
// the single source of truth stays poseidon_constants.py (regenerated from
// first principles there).
//
// Build: g++ -O3 -shared -fPIC -o libgoldilocks_poseidon.so goldilocks_poseidon.cpp

#include <cstdint>
#include <cstddef>
#include <cstring>

using u64 = uint64_t;
using u128 = __uint128_t;

static const u64 P = 0xFFFFFFFF00000001ULL;   // 2^64 - 2^32 + 1
static const u64 EPSILON = 0xFFFFFFFFULL;     // 2^64 mod p

static const int WIDTH = 12;
static const int N_ROUNDS = 30;
static const int HALF_FULL = 4;
static const int PARTIAL = 22;
static const int RATE = 8;

static u64 RC[N_ROUNDS * WIDTH];
static u64 MDS[WIDTH][WIDTH];
static bool initialized = false;

static inline u64 gl_add(u64 a, u64 b) {
    u64 s = a + b;
    if (s < a || s >= P) s -= P;
    return s;
}

static inline u64 gl_reduce128(u128 x) {
    u64 lo = (u64)x;
    u64 hi = (u64)(x >> 64);
    u64 hi_hi = hi >> 32;
    u64 hi_lo = hi & EPSILON;
    u64 t0 = lo - hi_hi;
    if (lo < hi_hi) t0 -= EPSILON;
    u64 t1 = hi_lo * EPSILON;
    u64 t2 = t0 + t1;
    if (t2 < t0) t2 += EPSILON;
    if (t2 >= P) t2 -= P;
    return t2;
}

static inline u64 gl_mul(u64 a, u64 b) {
    return gl_reduce128((u128)a * (u128)b);
}

static inline u64 sbox7(u64 x) {
    u64 x2 = gl_mul(x, x);
    u64 x3 = gl_mul(x2, x);
    u64 x6 = gl_mul(x3, x3);
    return gl_mul(x6, x);
}

static inline void mds_layer(u64* s) {
    u64 out[WIDTH];
    for (int r = 0; r < WIDTH; r++) {
        // entries are tiny (<= 49): accumulate hi/lo halves exactly in u128
        u128 acc = 0;
        for (int c = 0; c < WIDTH; c++) {
            acc += (u128)MDS[r][c] * (u128)s[c];
        }
        out[r] = gl_reduce128(acc);
    }
    memcpy(s, out, sizeof(out));
}

static void permute_one(u64* s) {
    int rnd = 0;
    for (; rnd < HALF_FULL; rnd++) {
        for (int i = 0; i < WIDTH; i++) s[i] = gl_add(s[i], RC[12 * rnd + i]);
        for (int i = 0; i < WIDTH; i++) s[i] = sbox7(s[i]);
        mds_layer(s);
    }
    for (; rnd < HALF_FULL + PARTIAL; rnd++) {
        for (int i = 0; i < WIDTH; i++) s[i] = gl_add(s[i], RC[12 * rnd + i]);
        s[0] = sbox7(s[0]);
        mds_layer(s);
    }
    for (; rnd < N_ROUNDS; rnd++) {
        for (int i = 0; i < WIDTH; i++) s[i] = gl_add(s[i], RC[12 * rnd + i]);
        for (int i = 0; i < WIDTH; i++) s[i] = sbox7(s[i]);
        mds_layer(s);
    }
}

extern "C" {

// Inject parameters (360 round constants + 144 MDS entries).
void gp_init(const u64* rc, const u64* mds) {
    memcpy(RC, rc, sizeof(RC));
    for (int r = 0; r < WIDTH; r++)
        for (int c = 0; c < WIDTH; c++)
            MDS[r][c] = mds[r * WIDTH + c];
    initialized = true;
}

int gp_ready() { return initialized ? 1 : 0; }

// In-place batch permutation of n row-major width-12 states.
void gp_permute_batch(u64* states, size_t n) {
    for (size_t i = 0; i < n; i++) permute_one(states + i * WIDTH);
}

// two_to_one over n digest pairs: (n,4) left, (n,4) right -> (n,4) out.
void gp_two_to_one_batch(const u64* left, const u64* right, u64* out, size_t n) {
    u64 s[WIDTH];
    for (size_t i = 0; i < n; i++) {
        memcpy(s, left + 4 * i, 4 * sizeof(u64));
        memcpy(s + 4, right + 4 * i, 4 * sizeof(u64));
        memset(s + 8, 0, 4 * sizeof(u64));
        permute_one(s);
        memcpy(out + 4 * i, s, 4 * sizeof(u64));
    }
}

// Overwrite-mode sponge (hash_n_to_m_no_pad) over m inputs -> 4 outputs.
void gp_hash_no_pad(const u64* inputs, size_t m, u64* out) {
    u64 s[WIDTH];
    memset(s, 0, sizeof(s));
    for (size_t start = 0; start < m; start += RATE) {
        size_t k = m - start < RATE ? m - start : RATE;
        memcpy(s, inputs + start, k * sizeof(u64));
        permute_one(s);
    }
    memcpy(out, s, 4 * sizeof(u64));
}

// Pairwise reduction of one Merkle level: (2n,4) digests -> (n,4).
void gp_tree_level(const u64* level, u64* next, size_t n_pairs) {
    u64 s[WIDTH];
    for (size_t i = 0; i < n_pairs; i++) {
        memcpy(s, level + 8 * i, 8 * sizeof(u64));
        memset(s + 8, 0, 4 * sizeof(u64));
        permute_one(s);
        memcpy(next + 4 * i, s, 4 * sizeof(u64));
    }
}

// Witness trace for one PoseidonGate row (plonk/gates.py wire layout).
// in: 12 inputs; out (118): S1 S2 S3 (36 s-box inputs of full rounds 1-3),
// PR (22 lane-0 s-box inputs of the partial rounds), S26 S27 S28 S29 (48),
// OUT (12).  Mirrors PoseidonGate.fill_row exactly.
void gp_poseidon_gate_trace(const u64* in, u64* out) {
    u64* s1 = out;          u64* s2 = out + 12;   u64* s3 = out + 24;
    u64* pr = out + 36;     u64* s26 = out + 58;  u64* s27 = out + 70;
    u64* s28 = out + 82;    u64* s29 = out + 94;  u64* outw = out + 106;
    u64 state[WIDTH];
    memcpy(state, in, sizeof(state));
    int rnd = 0;
    u64 s[WIDTH], x[WIDTH];
    for (; rnd < N_ROUNDS; rnd++) {
        for (int i = 0; i < WIDTH; i++) s[i] = gl_add(state[i], RC[12 * rnd + i]);
        u64* store = rnd == 1 ? s1 : rnd == 2 ? s2 : rnd == 3 ? s3 :
                     rnd == 26 ? s26 : rnd == 27 ? s27 : rnd == 28 ? s28 :
                     rnd == 29 ? s29 : nullptr;
        if (store) memcpy(store, s, sizeof(s));
        bool is_partial = rnd >= HALF_FULL && rnd < HALF_FULL + PARTIAL;
        if (is_partial) {
            pr[rnd - HALF_FULL] = s[0];
            x[0] = sbox7(s[0]);
            for (int i = 1; i < WIDTH; i++) x[i] = s[i];
        } else {
            for (int i = 0; i < WIDTH; i++) x[i] = sbox7(s[i]);
        }
        memcpy(state, x, sizeof(x));
        mds_layer(state);
    }
    memcpy(outw, state, sizeof(state));
}

// Batched witness traces: (n, 12) inputs -> (n, 118) stored wires.
void gp_poseidon_gate_trace_batch(const u64* in, u64* out, size_t n) {
    for (size_t i = 0; i < n; i++)
        gp_poseidon_gate_trace(in + 12 * i, out + 118 * i);
}

// Sequential MMR bulk append (canonical post-order layout).
// leaves: (n_leaves,) field elements; out: (2n - popcount(n), 4) digests.
void gp_mmr_from_leaves(const u64* leaves, size_t n_leaves, u64* out) {
    size_t pos = 0;
    for (size_t k = 0; k < n_leaves; k++) {
        // push leaf digest [leaf, 0, 0, 0] (hash_or_noop noop rule)
        out[4 * pos] = leaves[k] % P;
        out[4 * pos + 1] = out[4 * pos + 2] = out[4 * pos + 3] = 0;
        pos++;
        // a node of height h completes when (k+1) % 2^h == 0
        u64 s[WIDTH];
        for (size_t h = 1; ((k + 1) & ((1ULL << h) - 1)) == 0; h++) {
            size_t left_index = pos - 1 - ((1ULL << h) - 1);
            memcpy(s, out + 4 * left_index, 4 * sizeof(u64));
            memcpy(s + 4, out + 4 * (pos - 1), 4 * sizeof(u64));
            memset(s + 8, 0, 4 * sizeof(u64));
            permute_one(s);
            memcpy(out + 4 * pos, s, 4 * sizeof(u64));
            pos++;
        }
    }
}

}  // extern "C"
