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

}  // extern "C"
