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

// ---------------------------------------------------------------------------
// AVX-512 8-lane batched permutation.
//
// The scalar permute costs ~22k cycles (~10.5 us) on this host — entirely
// 64x64->128 MACs in the dense MDS plus the S-boxes.  With AVX-512 the same
// math runs 8 states per instruction stream: the MDS exploits the tiny
// (<= 49) matrix entries by accumulating lo/hi 32-bit halves exactly in
// 64-bit lanes (12 terms * 38 bits < 2^42, no overflow), and the full
// 64x64 S-box products use the 4x vpmuludq cross-product decomposition.
// Bit-identical to permute_one (same reduction sequence); selected at
// runtime via __builtin_cpu_supports so the .so still runs on older hosts.
// ---------------------------------------------------------------------------
#if defined(__x86_64__)
#include <immintrin.h>

__attribute__((target("avx512f,avx512dq")))
static inline __m512i v_add(__m512i a, __m512i b, __m512i vP) {
    __m512i s = _mm512_add_epi64(a, b);
    // if (s < a) [wrapped] or (s >= P): s -= P   (wrapping sub, as scalar)
    __mmask8 m = _mm512_cmplt_epu64_mask(s, a)
               | _mm512_cmpge_epu64_mask(s, vP);
    return _mm512_mask_sub_epi64(s, m, s, vP);
}

__attribute__((target("avx512f,avx512dq")))
static inline __m512i v_reduce128(__m512i lo, __m512i hi, __m512i vP,
                                  __m512i vEps) {
    __m512i hi_hi = _mm512_srli_epi64(hi, 32);
    __m512i hi_lo = _mm512_and_epi64(hi, vEps);
    __m512i t0 = _mm512_sub_epi64(lo, hi_hi);
    __mmask8 borrow = _mm512_cmplt_epu64_mask(lo, hi_hi);
    t0 = _mm512_mask_sub_epi64(t0, borrow, t0, vEps);
    __m512i t1 = _mm512_mul_epu32(hi_lo, vEps);     // hi_lo * (2^32-1) < 2^64
    __m512i t2 = _mm512_add_epi64(t0, t1);
    __mmask8 carry = _mm512_cmplt_epu64_mask(t2, t0);
    t2 = _mm512_mask_add_epi64(t2, carry, t2, vEps);
    __mmask8 ge = _mm512_cmpge_epu64_mask(t2, vP);
    return _mm512_mask_sub_epi64(t2, ge, t2, vP);
}

__attribute__((target("avx512f,avx512dq")))
static inline __m512i v_mul(__m512i a, __m512i b, __m512i vP, __m512i vEps) {
    __m512i a_hi = _mm512_srli_epi64(a, 32);
    __m512i b_hi = _mm512_srli_epi64(b, 32);
    __m512i ll = _mm512_mul_epu32(a, b);
    __m512i lh = _mm512_mul_epu32(a, b_hi);
    __m512i hl = _mm512_mul_epu32(a_hi, b);
    __m512i hh = _mm512_mul_epu32(a_hi, b_hi);
    __m512i t = _mm512_add_epi64(lh, hl);
    __mmask8 tc = _mm512_cmplt_epu64_mask(t, lh);   // carry out of lh+hl
    __m512i t_lo = _mm512_slli_epi64(t, 32);
    __m512i t_hi = _mm512_srli_epi64(t, 32);
    t_hi = _mm512_mask_add_epi64(                   // carry re-enters at bit 32
        t_hi, tc, t_hi, _mm512_set1_epi64(0x100000000LL));
    __m512i lo = _mm512_add_epi64(ll, t_lo);
    __mmask8 lc = _mm512_cmplt_epu64_mask(lo, ll);
    __m512i hi = _mm512_add_epi64(hh, t_hi);
    hi = _mm512_mask_add_epi64(hi, lc, hi, _mm512_set1_epi64(1));
    return v_reduce128(lo, hi, vP, vEps);
}

__attribute__((target("avx512f,avx512dq")))
static inline __m512i v_sbox7(__m512i x, __m512i vP, __m512i vEps) {
    __m512i x2 = v_mul(x, x, vP, vEps);
    __m512i x3 = v_mul(x2, x, vP, vEps);
    __m512i x6 = v_mul(x3, x3, vP, vEps);
    return v_mul(x6, x, vP, vEps);
}

__attribute__((target("avx512f,avx512dq")))
static void permute_avx512_8(u64* states) {   // 8 consecutive (12,) states
    const __m512i vP = _mm512_set1_epi64((long long)P);
    const __m512i vEps = _mm512_set1_epi64((long long)EPSILON);
    __m512i s[WIDTH];
    const __m512i stride_idx = _mm512_setr_epi64(0, 12, 24, 36, 48, 60, 72, 84);
    for (int w = 0; w < WIDTH; w++)
        s[w] = _mm512_i64gather_epi64(stride_idx, (const long long*)(states + w), 8);

    for (int rnd = 0; rnd < N_ROUNDS; rnd++) {
        bool full = rnd < HALF_FULL || rnd >= HALF_FULL + PARTIAL;
        for (int i = 0; i < WIDTH; i++)
            s[i] = v_add(s[i], _mm512_set1_epi64((long long)RC[12 * rnd + i]), vP);
        if (full) {
            for (int i = 0; i < WIDTH; i++) s[i] = v_sbox7(s[i], vP, vEps);
        } else {
            s[0] = v_sbox7(s[0], vP, vEps);
        }
        // MDS: tiny entries — exact lo/hi 32-bit-half accumulation
        __m512i s_lo[WIDTH], s_hi[WIDTH];
        for (int c = 0; c < WIDTH; c++) {
            s_lo[c] = _mm512_and_epi64(s[c], vEps);
            s_hi[c] = _mm512_srli_epi64(s[c], 32);
        }
        __m512i out[WIDTH];
        for (int r = 0; r < WIDTH; r++) {
            __m512i acc_lo = _mm512_setzero_si512();
            __m512i acc_hi = _mm512_setzero_si512();
            for (int c = 0; c < WIDTH; c++) {
                __m512i m = _mm512_set1_epi64((long long)MDS[r][c]);
                acc_lo = _mm512_add_epi64(acc_lo, _mm512_mul_epu32(m, s_lo[c]));
                acc_hi = _mm512_add_epi64(acc_hi, _mm512_mul_epu32(m, s_hi[c]));
            }
            // total = acc_lo + acc_hi * 2^32  (as a 128-bit lo/hi pair)
            __m512i ah_lo = _mm512_slli_epi64(acc_hi, 32);
            __m512i lo = _mm512_add_epi64(acc_lo, ah_lo);
            __mmask8 c1 = _mm512_cmplt_epu64_mask(lo, acc_lo);
            __m512i hi = _mm512_srli_epi64(acc_hi, 32);
            hi = _mm512_mask_add_epi64(hi, c1, hi, _mm512_set1_epi64(1));
            out[r] = v_reduce128(lo, hi, vP, vEps);
        }
        for (int r = 0; r < WIDTH; r++) s[r] = out[r];
    }
    const __m512i sc_idx = stride_idx;
    for (int w = 0; w < WIDTH; w++)
        _mm512_i64scatter_epi64((long long*)(states + w), sc_idx, s[w], 8);
}

static int avx512_ok = -1;
static inline bool use_avx512() {
    if (avx512_ok < 0)
        avx512_ok = __builtin_cpu_supports("avx512f")
                 && __builtin_cpu_supports("avx512dq") ? 1 : 0;
    return avx512_ok == 1;
}
#else
static inline bool use_avx512() { return false; }
static void permute_avx512_8(u64*) {}
#endif

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

}  // extern "C" (interrupted for internal helpers)

// In-place permutation of n row-major width-12 states: AVX-512 8-lane
// groups when the host supports it, scalar tail/fallback otherwise.
static void permute_many(u64* states, size_t n) {
    size_t i = 0;
    if (use_avx512())
        for (; i + 8 <= n; i += 8) permute_avx512_8(states + i * WIDTH);
    for (; i < n; i++) permute_one(states + i * WIDTH);
}

extern "C" {

// In-place batch permutation of n row-major width-12 states.
void gp_permute_batch(u64* states, size_t n) {
    permute_many(states, n);
}

// Overwrite-mode sponge over each ROW of an (n, m) matrix -> (n, 4)
// digests, with the hash_or_noop rule (m <= 4: zero-padded copy, no
// permutation).  One call replaces m/RATE ctypes round trips AND runs the
// batched permutation vectorised.
void gp_hash_rows(const u64* matrix, size_t n, size_t m, u64* out) {
    if (m <= 4) {
        for (size_t i = 0; i < n; i++) {
            for (size_t j = 0; j < 4; j++)
                out[4 * i + j] = j < m ? matrix[m * i + j] % P : 0;
        }
        return;
    }
    u64* states = new u64[n * WIDTH]();
    for (size_t start = 0; start < m; start += RATE) {
        size_t k = m - start < RATE ? m - start : RATE;
        for (size_t i = 0; i < n; i++)
            memcpy(states + i * WIDTH, matrix + i * m + start, k * sizeof(u64));
        permute_many(states, n);
    }
    for (size_t i = 0; i < n; i++)
        memcpy(out + 4 * i, states + i * WIDTH, 4 * sizeof(u64));
    delete[] states;
}

// Batched Merkle-path replay: current (n,4) digests walk their sibling
// paths (n, n_levels, 4) guided by per-query indices; digests are updated
// in place and indices[i] ends as the cap slot.  The whole walk is one
// call with one vectorised two_to_one per level.
void gp_verify_paths(u64* current, const u64* sibs, int64_t* indices,
                     size_t n, size_t n_levels) {
    u64* states = new u64[n * WIDTH];
    for (size_t lvl = 0; lvl < n_levels; lvl++) {
        for (size_t i = 0; i < n; i++) {
            const u64* sib = sibs + (i * n_levels + lvl) * 4;
            u64* s = states + i * WIDTH;
            if (indices[i] % 2 == 0) {
                memcpy(s, current + 4 * i, 4 * sizeof(u64));
                memcpy(s + 4, sib, 4 * sizeof(u64));
            } else {
                memcpy(s, sib, 4 * sizeof(u64));
                memcpy(s + 4, current + 4 * i, 4 * sizeof(u64));
            }
            memset(s + 8, 0, 4 * sizeof(u64));
            indices[i] /= 2;
        }
        permute_many(states, n);
        for (size_t i = 0; i < n; i++)
            memcpy(current + 4 * i, states + i * WIDTH, 4 * sizeof(u64));
    }
    delete[] states;
}

// Duplex-sponge bulk absorb (the Fiat-Shamir challenger's hot loop):
// absorb m elements into state in RATE-sized overwrite chunks.  m MUST be
// a multiple of RATE (the Python side drains partial buffers itself so
// buffer semantics stay in one place).
void gp_sponge_absorb(u64* state, const u64* xs, size_t m) {
    for (size_t start = 0; start < m; start += RATE) {
        memcpy(state, xs + start, RATE * sizeof(u64));
        permute_one(state);
    }
}

// two_to_one over n digest pairs: (n,4) left, (n,4) right -> (n,4) out.
void gp_two_to_one_batch(const u64* left, const u64* right, u64* out, size_t n) {
    u64* states = new u64[n * WIDTH];
    for (size_t i = 0; i < n; i++) {
        u64* s = states + i * WIDTH;
        memcpy(s, left + 4 * i, 4 * sizeof(u64));
        memcpy(s + 4, right + 4 * i, 4 * sizeof(u64));
        memset(s + 8, 0, 4 * sizeof(u64));
    }
    permute_many(states, n);
    for (size_t i = 0; i < n; i++)
        memcpy(out + 4 * i, states + i * WIDTH, 4 * sizeof(u64));
    delete[] states;
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
    u64* states = new u64[n_pairs * WIDTH];
    for (size_t i = 0; i < n_pairs; i++) {
        u64* s = states + i * WIDTH;
        memcpy(s, level + 8 * i, 8 * sizeof(u64));
        memset(s + 8, 0, 4 * sizeof(u64));
    }
    permute_many(states, n_pairs);
    for (size_t i = 0; i < n_pairs; i++)
        memcpy(next + 4 * i, states + i * WIDTH, 4 * sizeof(u64));
    delete[] states;
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

// ---------------------------------------------------------------------------
// Witness VM: executes the circuit's witness-generation program (one
// instruction per generator) over the dense store (V, K) with runtime
// dependency-counted scheduling.  Replaces the Python fixpoint engine's
// many hundreds of vectorised passes (deep sequential arithmetic chains in
// the in-circuit FRI verifier force one pass per dependency level) with a
// single native sweep.
//
// Instructions can appear in ANY order: the scheduler runs Kahn's algorithm
// at prove time, seeding availability from the cells the PartialWitness
// actually set (copy constraints routinely create build-time cycles — e.g.
// split_le's recomposition is connected back to its user-set input — that
// only a runtime view of K can break).
//
// Instruction stream: ops[i] selects the opcode, args[arg_off[i]..] holds
// the operands (root ids into V/K; field constants are bit-cast u64).
//   CONST   0: [out, c]
//   ARITH   1: [x, y, z, out, c0, c1]        out = c0*x*y + c1*z
//   POSEIDON2: [in0..in11, out0..out117]     gate trace (fill_row layout)
//   INV     3: [t, out]                      out = t^-1   (0 -> error 3)
//   EXTINV  4: [a0, a1, o0, o1, W]           quadratic-ext inverse
//   SPLIT   5: [t, nb, b0..b_{nb-1}]         little-endian bits
//   EQ      6: [x, y, b, inv]                b = (x==y), inv = (x-y)^-1|0
//
// cons_off/cons_idx: CSR mapping root id -> instructions that consume it
// (each instruction listed once per DISTINCT input root; unmet counts must
// match).  avail/unmet/queue are caller-allocated scratch; avail must enter
// as a copy of K.
//
// Return codes: 0 ok; 1 conflict (two writes disagree); 2 stuck (cyclic or
// missing user input); 3 inverse of zero.  err_idx: failing instruction.

static inline u64 gl_pow(u64 a, u64 e) {
    u64 r = 1;
    while (e) {
        if (e & 1) r = gl_mul(r, a);
        a = gl_mul(a, a);
        e >>= 1;
    }
    return r;
}

static inline u64 gl_inv(u64 a) { return gl_pow(a, P - 2); }

static inline u64 gl_sub(u64 a, u64 b) {
    u64 d = a - b;
    if (a < b) d += P;
    return d;
}

// Operand layout per opcode: inputs at [in0, in0+n_in), outputs at
// [out0, out0+n_out) within the instruction's args slice.
static inline void instr_io(int32_t op, const int64_t* a,
                            int* in0, int* n_in, int* out0, int* n_out) {
    switch (op) {
    case 0: *in0 = 0; *n_in = 0;  *out0 = 0;  *n_out = 1; break;          // CONST
    case 1: *in0 = 0; *n_in = 3;  *out0 = 3;  *n_out = 1; break;          // ARITH
    case 2: *in0 = 0; *n_in = 12; *out0 = 12; *n_out = 118; break;        // POSEIDON
    case 3: *in0 = 0; *n_in = 1;  *out0 = 1;  *n_out = 1; break;          // INV
    case 4: *in0 = 0; *n_in = 2;  *out0 = 2;  *n_out = 2; break;          // EXTINV
    case 5: *in0 = 0; *n_in = 1;  *out0 = 2;  *n_out = (int)a[1]; break;  // SPLIT
    case 6: *in0 = 0; *n_in = 2;  *out0 = 2;  *n_out = 2; break;          // EQ
    default: *in0 = 0; *n_in = 0; *out0 = 0;  *n_out = 0; break;
    }
}

extern "C" int gp_run_witness(
        const int32_t* ops, const int64_t* args, const int64_t* arg_off,
        int64_t n_instr,
        const int64_t* cons_off, const int32_t* cons_idx, int64_t n_roots,
        u64* V, uint8_t* K, uint8_t* avail, int32_t* unmet, int32_t* queue,
        int64_t* err_idx) {
    (void)n_roots;
    // seed: unmet[i] = #distinct input roots not yet available
    int64_t q_head = 0, q_tail = 0;
    for (int64_t i = 0; i < n_instr; i++) {
        const int64_t* a = args + arg_off[i];
        int in0, n_in, out0, n_out;
        instr_io(ops[i], a, &in0, &n_in, &out0, &n_out);
        int cnt = 0;
        for (int k = 0; k < n_in; k++) {
            int64_t r = a[in0 + k];
            if (avail[r]) continue;
            bool dup = false;
            for (int j = 0; j < k; j++)
                if (a[in0 + j] == r) { dup = true; break; }
            if (!dup) cnt++;
        }
        unmet[i] = cnt;
        if (cnt == 0) queue[q_tail++] = (int32_t)i;
    }

    int64_t executed = 0;
    while (q_head < q_tail) {
        int64_t i = queue[q_head++];
        const int64_t* a = args + arg_off[i];
        executed++;
        #define RD(id, var) \
            do { if (!K[(id)]) { *err_idx = i; return 2; } \
                 var = V[(id)]; } while (0)
        #define WR(id, val) \
            do { u64 v_ = (val); int64_t id_ = (id); \
                 if (K[id_]) { if (V[id_] != v_) { *err_idx = i; return 1; } } \
                 else { V[id_] = v_; K[id_] = 1; } } while (0)
        switch (ops[i]) {
        case 0: {  // CONST
            WR(a[0], (u64)a[1]);
            break;
        }
        case 1: {  // ARITH
            u64 x, y, z;
            RD(a[0], x); RD(a[1], y); RD(a[2], z);
            u64 c0 = (u64)a[4], c1 = (u64)a[5];
            WR(a[3], gl_add(gl_mul(gl_mul(c0, x), y), gl_mul(c1, z)));
            break;
        }
        case 2: {  // POSEIDON gate trace
            u64 in[12], tr[118];
            for (int k = 0; k < 12; k++) RD(a[k], in[k]);
            gp_poseidon_gate_trace(in, tr);
            for (int k = 0; k < 118; k++) WR(a[12 + k], tr[k]);
            break;
        }
        case 3: {  // INV
            u64 t;
            RD(a[0], t);
            if (t == 0) { *err_idx = i; return 3; }
            WR(a[1], gl_inv(t));
            break;
        }
        case 4: {  // EXTINV
            u64 a0, a1;
            RD(a[0], a0); RD(a[1], a1);
            u64 w = (u64)a[4];
            u64 norm = gl_sub(gl_mul(a0, a0), gl_mul(w, gl_mul(a1, a1)));
            if (norm == 0) { *err_idx = i; return 3; }
            u64 ni = gl_inv(norm);
            u64 neg_a1 = a1 == 0 ? 0 : P - a1;
            WR(a[2], gl_mul(a0, ni));
            WR(a[3], gl_mul(neg_a1, ni));
            break;
        }
        case 5: {  // SPLIT
            u64 t;
            RD(a[0], t);
            int64_t nb = a[1];
            for (int64_t k = 0; k < nb; k++)
                WR(a[2 + k], (t >> k) & 1ULL);
            break;
        }
        case 6: {  // EQ
            u64 x, y;
            RD(a[0], x); RD(a[1], y);
            u64 d = gl_sub(x, y);
            if (d == 0) { WR(a[2], 1ULL); WR(a[3], 0ULL); }
            else       { WR(a[2], 0ULL); WR(a[3], gl_inv(d)); }
            break;
        }
        default:
            *err_idx = i;
            return 2;
        }
        #undef RD
        #undef WR
        // release outputs
        int in0, n_in, out0, n_out;
        instr_io(ops[i], a, &in0, &n_in, &out0, &n_out);
        for (int k = 0; k < n_out; k++) {
            int64_t r = a[out0 + k];
            if (avail[r]) continue;
            avail[r] = 1;
            for (int64_t c = cons_off[r]; c < cons_off[r + 1]; c++) {
                if (--unmet[cons_idx[c]] == 0)
                    queue[q_tail++] = cons_idx[c];
            }
        }
    }
    if (executed < n_instr) {
        for (int64_t i = 0; i < n_instr; i++)
            if (unmet[i] > 0) { *err_idx = i; return 2; }
        *err_idx = -1;
        return 2;
    }
    return 0;
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

// GF(p^2) helpers for the FRI query phase (X^2 = 7, field_ext.py).
static inline void ext_mul2(const u64* a, const u64* b, u64* d) {
    u64 r0 = gl_add(gl_mul(a[0], b[0]), gl_mul(7, gl_mul(a[1], b[1])));
    u64 r1 = gl_add(gl_mul(a[0], b[1]), gl_mul(a[1], b[0]));
    d[0] = r0; d[1] = r1;
}

// out[q] = sum_j apow[j] * (vals[q][j] - ys[j])  — the verifier's batched
// oracle recombination (verifier.py compute_initial_eval).  vals are base
// field (q, n); ys/apow extension (n, 2); out (q, 2).
void gp_ext_dot(const u64* vals, const u64* ys, const u64* apow,
                size_t q, size_t n, u64* out) {
    for (size_t i = 0; i < q; i++) {
        u64 acc0 = 0, acc1 = 0;
        const u64* row = vals + i * n;
        for (size_t j = 0; j < n; j++) {
            u64 d[2] = {gl_sub(row[j] % P, ys[2 * j]),
                        gl_sub(0, ys[2 * j + 1])};
            u64 t[2];
            ext_mul2(apow + 2 * j, d, t);
            acc0 = gl_add(acc0, t[0]);
            acc1 = gl_add(acc1, t[1]);
        }
        out[2 * i] = acc0;
        out[2 * i + 1] = acc1;
    }
}

// Binary-fold one opened FRI coset per query down to a single value:
//   F'(x^2) = (F(x)+F(-x))/2 + beta * (F(x)-F(-x)) / (2x),
// iterated a_bits times with beta, beta^2, ... — exact twin of the
// vectorised numpy walk in fri.fri_verify (same mod-p op order).
// vals (q, 2^a_bits, 2) ext values; x0 (q,) coset base points; wm the
// in-coset step root; beta (2,); out (q, 2).
void gp_fold_coset(const u64* vals_in, const u64* x0, u64 wm,
                   const u64* beta, u64 half_inv,
                   size_t q, size_t a_bits, u64* out) {
    size_t size = (size_t)1 << a_bits;
    u64* vals = new u64[size * 2];
    u64* xs = new u64[size];
    for (size_t i = 0; i < q; i++) {
        memcpy(vals, vals_in + i * size * 2, size * 2 * sizeof(u64));
        xs[0] = x0[i] % P;
        for (size_t t = 1; t < size; t++) xs[t] = gl_mul(xs[t - 1], wm);
        u64 b[2] = {beta[0], beta[1]};
        for (size_t s = size; s > 1; s >>= 1) {
            size_t h = s >> 1;
            for (size_t t = 0; t < h; t++) {
                u64 e0 = gl_mul(gl_add(vals[2 * t], vals[2 * (t + h)]),
                                half_inv);
                u64 e1 = gl_mul(gl_add(vals[2 * t + 1], vals[2 * (t + h) + 1]),
                                half_inv);
                u64 d[2] = {gl_sub(vals[2 * t], vals[2 * (t + h)]),
                            gl_sub(vals[2 * t + 1], vals[2 * (t + h) + 1])};
                u64 o[2];
                ext_mul2(d, b, o);
                u64 txi = gl_inv(gl_mul(xs[t], 2));
                vals[2 * t] = gl_add(e0, gl_mul(o[0], txi));
                vals[2 * t + 1] = gl_add(e1, gl_mul(o[1], txi));
                xs[t] = gl_mul(xs[t], xs[t]);
            }
            ext_mul2(b, b, b);
        }
        out[2 * i] = vals[0];
        out[2 * i + 1] = vals[1];
    }
    delete[] vals;
    delete[] xs;
}

// Batched Horner: out[q] = sum_k coeffs[k] * x[q]^k over GF(p^2) with
// base-field points x (the FRI final-polynomial check).
void gp_ext_horner(const u64* coeffs, size_t k, const u64* x, size_t q,
                   u64* out) {
    for (size_t i = 0; i < q; i++) {
        u64 acc0 = 0, acc1 = 0;
        u64 xi = x[i] % P;
        for (size_t j = k; j-- > 0;) {
            u64 n0 = gl_add(gl_mul(acc0, xi), coeffs[2 * j]);
            u64 n1 = gl_add(gl_mul(acc1, xi), coeffs[2 * j + 1]);
            acc0 = n0; acc1 = n1;
        }
        out[2 * i] = acc0;
        out[2 * i + 1] = acc1;
    }
}

// Straight-line GF(p^2) (X^2 = 7) expression tape — the verifier's
// combined-constraint evaluation at zeta.  The op sequence is circuit-
// static, so Python records it once (plonk/algebra.py RecordingAlgebra)
// and replays it here per verify: ~12k extension ops drop from ~30 ms of
// Python object arithmetic to well under a millisecond.
//
// instr: (n_instr, 4) int32 rows [op, dst, a, b]; regs: (n_regs, 2) u64
// register file with constants and inputs pre-filled by the caller.
// ops: 0 ADD, 1 SUB, 2 MUL, 3 EXP7 (b ignored).
void gp_ext_tape(const int32_t* instr, int64_t n_instr, u64* regs) {
    const u64 W = 7;  // extension non-residue (field_ext.py:19)
    for (int64_t i = 0; i < n_instr; i++) {
        const int32_t* q = instr + 4 * i;
        const u64* a = regs + 2 * (int64_t)(uint32_t)q[2];
        const u64* b = regs + 2 * (int64_t)(uint32_t)q[3];
        u64 r0, r1;
        switch (q[0]) {
        case 0:
            r0 = gl_add(a[0], b[0]); r1 = gl_add(a[1], b[1]);
            break;
        case 1:
            r0 = gl_sub(a[0], b[0]); r1 = gl_sub(a[1], b[1]);
            break;
        case 2:
            r0 = gl_add(gl_mul(a[0], b[0]), gl_mul(W, gl_mul(a[1], b[1])));
            r1 = gl_add(gl_mul(a[0], b[1]), gl_mul(a[1], b[0]));
            break;
        case 3: {  // x^7 = ((x^2)^2)^... via x2, x3, x6
            u64 x20 = gl_add(gl_mul(a[0], a[0]), gl_mul(W, gl_mul(a[1], a[1])));
            u64 x21 = gl_add(gl_mul(a[0], a[1]), gl_mul(a[1], a[0]));
            u64 x30 = gl_add(gl_mul(x20, a[0]), gl_mul(W, gl_mul(x21, a[1])));
            u64 x31 = gl_add(gl_mul(x20, a[1]), gl_mul(x21, a[0]));
            u64 x60 = gl_add(gl_mul(x30, x30), gl_mul(W, gl_mul(x31, x31)));
            u64 x61 = gl_add(gl_mul(x30, x31), gl_mul(x31, x30));
            r0 = gl_add(gl_mul(x60, a[0]), gl_mul(W, gl_mul(x61, a[1])));
            r1 = gl_add(gl_mul(x60, a[1]), gl_mul(x61, a[0]));
            break;
        }
        default:
            r0 = r1 = 0;
            break;
        }
        u64* d = regs + 2 * (int64_t)(uint32_t)q[1];
        d[0] = r0; d[1] = r1;
    }
}

}  // extern "C"
