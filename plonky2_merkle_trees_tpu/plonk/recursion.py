"""Recursive verification: verify a proof INSIDE a circuit.

Provides the plonky2 recursion surface the reference consumes
(SURVEY.md §2.2 row "Recursion API"):

* ``add_virtual_proof_with_pis(builder, common_data)``
* ``add_virtual_verifier_data(builder, cap_height, ...)``
* ``verify_proof_circuit(builder, proof_t, verifier_data_t, common_data)``
  (the reference's ``builder.verify_proof``)
* witness setters ``set_proof_with_pis_target`` / ``set_verifier_data_target``

The in-circuit verifier is the gadget twin of verifier.py + fri.py: the
SAME ``eval_combined`` runs over a circuit algebra whose values are pairs of
targets (GF(p^2) elements), the Fiat-Shamir challenger is replayed with
in-circuit Poseidon rows, Merkle paths are walked with bit-muxed hash
inputs, and every FRI fold is checked with explicitly-witnessed inverses.
"""

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np

from .. import field
from .builder import BoolTarget, CircuitBuilder, HashOutTarget
from .field_ext import ExtensionField, W
from .gates import GATE_REGISTRY
from .vanishing import CHUNK, eval_combined
from ..poseidon_constants import RATE, WIDTH

P = field.P

ExtTarget = Tuple[int, int]


# ---------------------------------------------------------------------------
# circuit extension-field algebra
# ---------------------------------------------------------------------------

class CircuitExtAlgebra:
    """GF(p^2) arithmetic over (target, target) pairs — the algebra the
    shared vanishing-evaluation code runs on inside the recursive circuit."""

    def __init__(self, builder: CircuitBuilder):
        self.b = builder

    def constant(self, c: int) -> ExtTarget:
        return (self.b.constant(c), self.b.zero())

    def from_base(self, t: int) -> ExtTarget:
        return (t, self.b.zero())

    def add(self, a: ExtTarget, b: ExtTarget) -> ExtTarget:
        return (self.b.add(a[0], b[0]), self.b.add(a[1], b[1]))

    def sub(self, a: ExtTarget, b: ExtTarget) -> ExtTarget:
        return (self.b.sub(a[0], b[0]), self.b.sub(a[1], b[1]))

    def mul(self, a: ExtTarget, b: ExtTarget) -> ExtTarget:
        # (a0 b0 + W a1 b1,  a0 b1 + a1 b0)
        bb = self.b
        a0b0 = bb.mul(a[0], b[0])
        a1b1 = bb.mul(a[1], b[1])
        c0 = bb.arithmetic(W, 1, a[1], b[1], a0b0)      # W*a1*b1 + a0b0
        del a1b1
        a0b1 = bb.mul(a[0], b[1])
        c1 = bb.mul_add(a[1], b[0], a0b1)
        return (c0, c1)

    def mul_const(self, a: ExtTarget, c: int) -> ExtTarget:
        return (self.b.mul_const(c, a[0]), self.b.mul_const(c, a[1]))

    def add_const(self, a: ExtTarget, c: int) -> ExtTarget:
        return (self.b.add_const(a[0], c), a[1])

    def exp7(self, a: ExtTarget) -> ExtTarget:
        a2 = self.mul(a, a)
        a3 = self.mul(a2, a)
        a6 = self.mul(a3, a3)
        return self.mul(a6, a)

    def mul_base(self, a: ExtTarget, t: int) -> ExtTarget:
        return (self.b.mul(a[0], t), self.b.mul(a[1], t))

    def connect(self, a: ExtTarget, b: ExtTarget) -> None:
        self.b.connect(a[0], b[0])
        self.b.connect(a[1], b[1])

    def select(self, bit: BoolTarget, a: ExtTarget, b: ExtTarget) -> ExtTarget:
        return (self.b.select(bit, a[0], b[0]), self.b.select(bit, a[1], b[1]))

    def add_virtual(self) -> ExtTarget:
        return (self.b.add_virtual_target(), self.b.add_virtual_target())

    def inverse(self, a: ExtTarget) -> ExtTarget:
        """Witnessed inverse: inv with a * inv == 1 enforced."""
        inv = self.add_virtual()
        a0_t, a1_t = a
        i0_t, i1_t = inv

        def gen(w, a0_t=a0_t, a1_t=a1_t, i0_t=i0_t, i1_t=i1_t):
            a0, a1 = w.get_target(a0_t), w.get_target(a1_t)
            if a0 is None or a1 is None:
                return False
            e = ExtensionField(a0, a1).inverse()
            w.set_target(i0_t, e.a0)
            w.set_target(i1_t, e.a1)
            return True
        self.b.generators.append(gen)
        self.b.gen_descs.append(("ext_inv", a0_t, a1_t, i0_t, i1_t))
        prod = self.mul(a, inv)
        self.connect(prod, self.constant(1))
        return inv

    def div(self, a: ExtTarget, b: ExtTarget) -> ExtTarget:
        return self.mul(a, self.inverse(b))

    def exp_pow2(self, a: ExtTarget, log_e: int) -> ExtTarget:
        for _ in range(log_e):
            a = self.mul(a, a)
        return a


# ---------------------------------------------------------------------------
# bit decomposition / muxing gadgets
# ---------------------------------------------------------------------------

def split_le(builder: CircuitBuilder, t: int, n_bits: int = 64,
             check_canonical: bool = True) -> List[BoolTarget]:
    """Little-endian bit decomposition with recomposition constraint and (for
    64-bit values) a canonical-form check: values >= p have the top 32 bits
    all ones AND a non-zero low word, which is forbidden — this makes the
    decomposition of a field element unique (no +p ambiguity)."""
    bits = [builder.add_virtual_bool_target_unsafe() for _ in range(n_bits)]

    def gen(w, t=t, bit_targets=[b.target for b in bits]):
        v = w.get_target(t)
        if v is None:
            return False
        for i, bt in enumerate(bit_targets):
            w.set_target(bt, (v >> i) & 1)
        return True
    builder.generators.append(gen)
    builder.gen_descs.append(("split", t, tuple(b.target for b in bits)))

    for b in bits:
        builder.assert_bool_target(b.target)
    # recomposition: sum bits[i] * 2^i == t
    acc = builder.zero()
    for i in reversed(range(n_bits)):
        acc = builder.arithmetic(2, 1, acc, builder.one(), bits[i].target)
    builder.connect(acc, t)

    if check_canonical and n_bits == 64:
        hi_all = bits[32].target
        for i in range(33, 64):
            hi_all = builder.mul(hi_all, bits[i].target)
        lo_sum = builder.add_many([b.target for b in bits[:32]])
        lo_zero = builder.is_equal(lo_sum, builder.zero())
        lo_nonzero = builder.not_(lo_zero)
        # hi_all * lo_nonzero must be 0
        bad = builder.mul(hi_all, lo_nonzero.target)
        builder.connect(bad, builder.zero())
    return bits


def select_digest_by_bits(builder: CircuitBuilder, digests: List[HashOutTarget],
                          bits: List[BoolTarget]) -> HashOutTarget:
    """Binary-mux a list of 2^len(bits) digests down to one."""
    assert len(digests) == 1 << len(bits)
    layer = digests
    for bit in bits:
        nxt = []
        half = len(layer) // 2
        for j in range(half):
            a, b = layer[2 * j], layer[2 * j + 1]
            nxt.append(HashOutTarget([
                builder.select(bit, b.elements[i], a.elements[i])
                for i in range(4)]))
        layer = nxt
    return layer[0]


def exp_from_bits(builder: CircuitBuilder, base: int,
                  bits: List[BoolTarget]) -> int:
    """omega^index from index bits: prod_i (bits[i] ? base^(2^i) : 1)."""
    acc = builder.one()
    cur = base % P
    for bit in bits:
        term = builder.select(bit, builder.constant(cur), builder.one())
        acc = builder.mul(acc, term)
        cur = cur * cur % P
    return acc


def merkle_verify_circuit(builder: CircuitBuilder, leaf_values: List[int],
                          index_bits: List[BoolTarget],
                          path: List[HashOutTarget],
                          cap: List[HashOutTarget]) -> None:
    """Walk a Merkle path with bit-muxed ordering; connect to the cap entry
    selected by the remaining index bits."""
    if len(leaf_values) <= 4:
        padded = list(leaf_values) + [builder.zero()] * (4 - len(leaf_values))
        digest = HashOutTarget(padded)
    else:
        digest = builder.hash_n_to_hash_no_pad(list(leaf_values))
    for level, sibling in enumerate(path):
        bit = index_bits[level]  # 1 => current node is the RIGHT child
        inputs = []
        for i in range(4):
            inputs.append(builder.select(bit, sibling.elements[i],
                                         digest.elements[i]))
        for i in range(4):
            inputs.append(builder.select(bit, digest.elements[i],
                                         sibling.elements[i]))
        state = inputs + [builder.zero()] * (WIDTH - 8)
        digest = HashOutTarget(builder.permute(state)[:4])
    cap_bits = index_bits[len(path):len(path) + _log2(len(cap))]
    expected = select_digest_by_bits(builder, cap, cap_bits)
    builder.connect_hashes(digest, expected)


def _log2(n: int) -> int:
    return n.bit_length() - 1


# ---------------------------------------------------------------------------
# challenger gadget
# ---------------------------------------------------------------------------

class RecursiveChallenger:
    """In-circuit twin of plonk.challenger.Challenger."""

    def __init__(self, builder: CircuitBuilder):
        self.b = builder
        self.state: List[int] = [builder.zero()] * WIDTH
        self.input_buffer: List[int] = []
        self.output_buffer: List[int] = []

    def _duplex(self) -> None:
        for i, t in enumerate(self.input_buffer):
            self.state[i] = t
        self.input_buffer.clear()
        self.state = self.b.permute(list(self.state))
        self.output_buffer = list(self.state[:RATE])

    def observe_element(self, t: int) -> None:
        self.output_buffer.clear()
        self.input_buffer.append(t)
        if len(self.input_buffer) == RATE:
            self._duplex()

    def observe_elements(self, ts) -> None:
        for t in ts:
            self.observe_element(t)

    def observe_hash(self, h: HashOutTarget) -> None:
        self.observe_elements(h.elements)

    def observe_cap(self, cap: List[HashOutTarget]) -> None:
        for h in cap:
            self.observe_hash(h)

    def observe_extension(self, e: ExtTarget) -> None:
        self.observe_element(e[0])
        self.observe_element(e[1])

    def get_challenge(self) -> int:
        if self.input_buffer or not self.output_buffer:
            self._duplex()
        return self.output_buffer.pop()

    def get_n_challenges(self, n: int) -> List[int]:
        return [self.get_challenge() for _ in range(n)]

    def get_extension_challenge(self) -> ExtTarget:
        a0 = self.get_challenge()
        a1 = self.get_challenge()
        return (a0, a1)


# ---------------------------------------------------------------------------
# proof target structures
# ---------------------------------------------------------------------------

@dataclass
class FriQueryStepTarget:
    coset_values: List[ExtTarget]
    path: List[HashOutTarget]


@dataclass
class FriQueryRoundTarget:
    initial_leaves: List[List[int]]          # per oracle
    initial_paths: List[List[HashOutTarget]]
    steps: List[FriQueryStepTarget]


@dataclass
class FriProofTarget:
    commit_caps: List[List[HashOutTarget]]
    final_poly: List[ExtTarget]
    pow_witness: int
    query_rounds: List[FriQueryRoundTarget]


@dataclass
class OpeningSetTarget:
    constants_sigmas: List[ExtTarget]
    wires: List[ExtTarget]
    zs: List[ExtTarget]
    partials: List[ExtTarget]
    quotient: List[ExtTarget]
    zs_next: List[ExtTarget]

    def flat(self) -> List[ExtTarget]:
        return (self.constants_sigmas + self.wires + self.zs + self.partials
                + self.quotient + self.zs_next)


@dataclass
class ProofWithPublicInputsTarget:
    public_inputs: List[int]
    wires_cap: List[HashOutTarget]
    zs_partial_cap: List[HashOutTarget]
    quotient_cap: List[HashOutTarget]
    openings: OpeningSetTarget
    fri: FriProofTarget


@dataclass
class VerifierCircuitTarget:
    constants_sigmas_cap: List[HashOutTarget]
    circuit_digest: HashOutTarget


# ---------------------------------------------------------------------------
# shape helpers (all derived from the inner circuit's CommonCircuitData)
# ---------------------------------------------------------------------------

def _oracle_sizes(common) -> List[int]:
    config = common.config
    nc = config.num_challenges
    num_chunks = config.num_routed_wires // CHUNK
    num_sel = len(GATE_REGISTRY)
    return [num_sel + 2 + config.num_routed_wires, config.num_wires,
            nc * num_chunks, nc * (1 << config.fri_config.rate_bits)]


def _fri_layer_shapes(common):
    """[(arity_bits, leaves_log, cap_height, path_len)] per FRI layer, plus
    the final-poly length and final domain log-size."""
    fri_cfg = common.config.fri_config
    arities = fri_cfg.reduction_arity_bits(common.degree_bits)
    shapes = []
    cur_log = common.lde_bits
    for a in arities:
        leaves_log = cur_log - a
        cap = min(fri_cfg.cap_height, leaves_log)
        shapes.append((a, leaves_log, cap, leaves_log - cap))
        cur_log = leaves_log
    final_len = min(1 << cur_log, 1 << fri_cfg.final_poly_max_degree_bits)
    return shapes, final_len, cur_log


# ---------------------------------------------------------------------------
# allocation + witness setting
# ---------------------------------------------------------------------------

def _virtual_cap(builder: CircuitBuilder, cap_height: int) -> List[HashOutTarget]:
    return [builder.add_virtual_hash() for _ in range(1 << cap_height)]


def add_virtual_proof_with_pis(builder: CircuitBuilder, common
                               ) -> ProofWithPublicInputsTarget:
    config = common.config
    fri_cfg = config.fri_config
    nc = config.num_challenges
    num_chunks = config.num_routed_wires // CHUNK
    sizes = _oracle_sizes(common)
    # zk proofs append 4 salt elements to every WITNESS-oracle leaf (never
    # the public preprocessed oracle); the salt is hashed into the Merkle
    # leaf but excluded from recombination (mirrors the host verifier's
    # real_sizes/oracle_sizes split, plonk/verifier.py).  The reference
    # never recursively verifies a zk proof — this covers the plonky2
    # 0.1.3 dependency surface beyond it.
    zk_salt = 4 if config.zero_knowledge else 0
    leaf_sizes = [sizes[0]] + [sz + zk_salt for sz in sizes[1:]]
    shapes, final_len, _ = _fri_layer_shapes(common)
    cap_h = min(fri_cfg.cap_height, common.lde_bits)
    oracle_path_len = common.lde_bits - cap_h

    def ext() -> ExtTarget:
        return (builder.add_virtual_target(), builder.add_virtual_target())

    openings = OpeningSetTarget(
        constants_sigmas=[ext() for _ in range(sizes[0])],
        wires=[ext() for _ in range(sizes[1])],
        zs=[ext() for _ in range(nc)],
        partials=[ext() for _ in range(nc * (num_chunks - 1))],
        quotient=[ext() for _ in range(sizes[3])],
        zs_next=[ext() for _ in range(nc)],
    )
    query_rounds = []
    for _ in range(fri_cfg.num_query_rounds):
        initial_leaves = [[builder.add_virtual_target() for _ in range(s)]
                          for s in leaf_sizes]
        initial_paths = [[builder.add_virtual_hash()
                          for _ in range(oracle_path_len)] for _ in sizes]
        steps = [FriQueryStepTarget(
                    coset_values=[ext() for _ in range(1 << a)],
                    path=[builder.add_virtual_hash() for _ in range(path_len)])
                 for (a, _, _, path_len) in shapes]
        query_rounds.append(FriQueryRoundTarget(
            initial_leaves=initial_leaves, initial_paths=initial_paths,
            steps=steps))
    fri = FriProofTarget(
        commit_caps=[_virtual_cap(builder, cap) for (_, _, cap, _) in shapes],
        final_poly=[ext() for _ in range(final_len)],
        pow_witness=builder.add_virtual_target(),
        query_rounds=query_rounds,
    )
    return ProofWithPublicInputsTarget(
        public_inputs=[builder.add_virtual_target()
                       for _ in range(common.num_public_inputs)],
        wires_cap=_virtual_cap(builder, cap_h),
        zs_partial_cap=_virtual_cap(builder, cap_h),
        quotient_cap=_virtual_cap(builder, cap_h),
        openings=openings, fri=fri)


def add_virtual_verifier_data(builder: CircuitBuilder, cap_height: int
                              ) -> VerifierCircuitTarget:
    return VerifierCircuitTarget(
        constants_sigmas_cap=_virtual_cap(builder, cap_height),
        circuit_digest=builder.add_virtual_hash())


def set_proof_with_pis_target(pw, tgt: ProofWithPublicInputsTarget, pwpi) -> None:
    proof = pwpi.proof
    for t, v in zip(tgt.public_inputs, pwpi.public_inputs):
        pw.set_target(t, int(v))

    def set_cap(cap_t, cap_v):
        for h, d in zip(cap_t, np.asarray(cap_v)):
            pw.set_hash_target(h, d)

    set_cap(tgt.wires_cap, proof.wires_cap)
    set_cap(tgt.zs_partial_cap, proof.zs_partial_cap)
    set_cap(tgt.quotient_cap, proof.quotient_cap)

    def set_ext(et, ev):
        pw.set_target(et[0], ev.a0)
        pw.set_target(et[1], ev.a1)

    for name in ("constants_sigmas", "wires", "zs", "partials", "quotient",
                 "zs_next"):
        for et, ev in zip(getattr(tgt.openings, name),
                          getattr(proof.openings, name)):
            set_ext(et, ev)

    for cap_t, cap_v in zip(tgt.fri.commit_caps, proof.fri.commit_caps):
        set_cap(cap_t, cap_v)
    for et, ev in zip(tgt.fri.final_poly, proof.fri.final_poly):
        set_ext(et, ev)
    pw.set_target(tgt.fri.pow_witness, proof.fri.pow_witness)
    for qr_t, qr in zip(tgt.fri.query_rounds, proof.fri.query_rounds):
        for leaf_t, leaf in zip(qr_t.initial_leaves, qr.initial.leaf_values):
            for t, v in zip(leaf_t, leaf):
                pw.set_target(t, int(v))
        for path_t, path in zip(qr_t.initial_paths, qr.initial.paths):
            for h, d in zip(path_t, path):
                pw.set_hash_target(h, d)
        for st_t, st in zip(qr_t.steps, qr.steps):
            for et, ev in zip(st_t.coset_values, np.asarray(st.coset_values)):
                pw.set_target(et[0], int(ev[0]))
                pw.set_target(et[1], int(ev[1]))
            for h, d in zip(st_t.path, st.path):
                pw.set_hash_target(h, d)


def set_verifier_data_target(pw, tgt: VerifierCircuitTarget, verifier_only) -> None:
    for h, d in zip(tgt.constants_sigmas_cap,
                    np.asarray(verifier_only.constants_sigmas_cap)):
        pw.set_hash_target(h, d)
    pw.set_hash_target(tgt.circuit_digest, verifier_only.circuit_digest)


# ---------------------------------------------------------------------------
# the in-circuit verifier
# ---------------------------------------------------------------------------

def verify_proof_circuit(builder: CircuitBuilder,
                         proof_t: ProofWithPublicInputsTarget,
                         vdata_t: VerifierCircuitTarget, common) -> None:
    config = common.config
    fri_cfg = config.fri_config
    n = common.degree
    nc = config.num_challenges
    r_wires = config.num_routed_wires
    num_chunks = r_wires // CHUNK
    num_sel = len(GATE_REGISTRY)
    alg = CircuitExtAlgebra(builder)
    op = proof_t.openings

    # public-input digest (matches builder.build / verifier rules)
    if proof_t.public_inputs:
        pi_hash = builder.hash_n_to_hash_no_pad(list(proof_t.public_inputs))
    else:
        pi_hash = HashOutTarget([builder.zero()] * 4)

    # --- transcript replay ---
    ch = RecursiveChallenger(builder)
    ch.observe_hash(vdata_t.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof_t.wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    ch.observe_cap(proof_t.zs_partial_cap)
    alphas = ch.get_n_challenges(nc)
    ch.observe_cap(proof_t.quotient_cap)
    zeta = ch.get_extension_challenge()
    for e in op.flat():
        ch.observe_extension(e)
    fri_alpha = ch.get_extension_challenge()

    # --- vanishing check at zeta ---
    sels = op.constants_sigmas[:num_sel]
    consts = op.constants_sigmas[num_sel:num_sel + 2]
    sigmas = op.constants_sigmas[num_sel + 2:num_sel + 2 + r_wires]
    partials = {c: op.partials[c * (num_chunks - 1):(c + 1) * (num_chunks - 1)]
                for c in range(nc)}
    pi_hash_ext = [alg.from_base(t) for t in pi_hash.elements]

    zeta_pow_n = alg.exp_pow2(zeta, common.degree_bits)
    zh = alg.add_const(zeta_pow_n, P - 1)
    l0 = alg.div(zh, alg.mul_const(alg.add_const(zeta, P - 1), n % P))
    combined = eval_combined(
        alg, r_wires, common.k_is, zeta, op.wires, sels, consts, sigmas,
        op.zs, op.zs_next, partials,
        [alg.from_base(b) for b in betas], [alg.from_base(g) for g in gammas],
        [alg.from_base(a) for a in alphas], pi_hash_ext, l0)

    rate = 1 << fri_cfg.rate_bits
    for c in range(nc):
        t_at_zeta = alg.constant(0)
        for chunk in reversed(op.quotient[c * rate:(c + 1) * rate]):
            t_at_zeta = alg.add(alg.mul(t_at_zeta, zeta_pow_n), chunk)
        alg.connect(combined[c], alg.mul(zh, t_at_zeta))

    # --- FRI ---
    shapes, final_len, final_log = _fri_layer_shapes(common)
    fri_betas = []
    for cap in proof_t.fri.commit_caps:
        ch.observe_cap(cap)
        fri_betas.append(ch.get_extension_challenge())
    for coeff in proof_t.fri.final_poly:
        ch.observe_extension(coeff)

    # PoW: challenge's top proof_of_work_bits must be zero
    ch.observe_element(proof_t.fri.pow_witness)
    pow_challenge = ch.get_challenge()
    pow_bits = split_le(builder, pow_challenge)
    for i in range(64 - fri_cfg.proof_of_work_bits, 64):
        builder.connect(pow_bits[i].target, builder.zero())

    omega = field.primitive_root_of_unity(common.degree_bits)
    zeta_next = alg.mul_const(zeta, omega)
    lde_omega = field.primitive_root_of_unity(common.lde_bits)
    shift = field.MULTIPLICATIVE_GROUP_GENERATOR
    ys1 = (op.constants_sigmas + op.wires + op.zs + op.partials + op.quotient)
    n1 = len(ys1)
    fri_alpha_n1 = alg.constant(1)
    for _ in range(n1):
        fri_alpha_n1 = alg.mul(fri_alpha_n1, fri_alpha)
    cap_h = min(fri_cfg.cap_height, common.lde_bits)
    oracle_path_len = common.lde_bits - cap_h
    oracle_caps = [vdata_t.constants_sigmas_cap, proof_t.wires_cap,
                   proof_t.zs_partial_cap, proof_t.quotient_cap]

    for qr in proof_t.fri.query_rounds:
        index_c = ch.get_challenge()
        index_bits = split_le(builder, index_c)[:common.lde_bits]

        # initial openings against the four oracle caps
        for leaf, path, cap in zip(qr.initial_leaves, qr.initial_paths,
                                   oracle_caps):
            merkle_verify_circuit(builder, leaf, index_bits, path, cap)

        # recombine F(x) at the query point
        x = builder.mul_const(shift, exp_from_bits(builder, lde_omega, index_bits))
        x_ext = alg.from_base(x)
        acc1 = alg.constant(0)
        # recombine only the REAL polynomial values: zk leaves carry 4
        # trailing salt targets per witness oracle (hashed above, not part
        # of any polynomial)
        real_sizes = _oracle_sizes(common)
        flat_leaf = [t for leaf, rs in zip(qr.initial_leaves, real_sizes)
                     for t in leaf[:rs]]
        for v, y in zip(reversed(flat_leaf), reversed(ys1)):
            acc1 = alg.add(alg.mul(acc1, fri_alpha),
                           alg.sub(alg.from_base(v), y))
        value = alg.div(acc1, alg.sub(x_ext, zeta))
        zs_leaf = qr.initial_leaves[2][:nc]
        acc2 = alg.constant(0)
        for v, y in zip(reversed(zs_leaf), reversed(op.zs_next)):
            acc2 = alg.add(alg.mul(acc2, fri_alpha),
                           alg.sub(alg.from_base(v), y))
        value = alg.add(value, alg.mul(fri_alpha_n1,
                                       alg.div(acc2, alg.sub(x_ext, zeta_next))))

        # layer walk
        bits = index_bits
        cur_log = common.lde_bits
        cur_shift = shift
        cur_omega = lde_omega
        for (a_bits, leaves_log, cap, path_len), step, beta, cap_t in zip(
                shapes, qr.steps, fri_betas, proof_t.fri.commit_caps):
            m_next_log = leaves_log
            row_bits = bits[:m_next_log]
            pos_bits = bits[m_next_log:cur_log]
            # opened coset leaf: flatten ext values -> base targets
            leaf_flat = [t for e in step.coset_values for t in e]
            merkle_verify_circuit(builder, leaf_flat, row_bits, step.path, cap_t)
            # current value must equal the coset entry at pos
            layer = list(step.coset_values)
            for bit in pos_bits:
                layer = [alg.select(bit, layer[2 * j + 1], layer[2 * j])
                         for j in range(len(layer) // 2)]
            alg.connect(layer[0], value)

            # fold the coset: x_row from row bits, then binary folds
            x_row = builder.mul_const(cur_shift,
                                      exp_from_bits(builder, cur_omega, row_bits))
            two_x = builder.mul_const(2, x_row)
            inv2x = _base_inverse(builder, two_x)     # 1/(2 x_row)
            vals = list(step.coset_values)
            cur_b = beta
            size = 1 << a_bits
            m_next = 1 << m_next_log
            # constant offsets: c_t = omega_layer^(t * m_next)
            c_offsets = [pow(cur_omega, t * m_next, P) for t in range(size)]
            j_d = inv2x
            half_inv = field.h_inverse(2)
            d = 0
            while size > 1:
                nxt = []
                for t in range(size // 2):
                    a_v, b_v = vals[t], vals[t + size // 2]
                    e = alg.mul_const(alg.add(a_v, b_v), half_inv)
                    inv_c = field.h_inverse(pow(c_offsets[t], 1 << d, P))
                    inv_x_t = builder.mul_const(inv_c, j_d)
                    o = alg.mul(alg.mul_base(alg.sub(a_v, b_v), inv_x_t), cur_b)
                    nxt.append(alg.add(e, o))
                vals = nxt
                size //= 2
                cur_b = alg.mul(cur_b, cur_b)
                # j_{d+1} = 2 * j_d^2
                j_d = builder.mul_const(2, builder.mul(j_d, j_d))
                d += 1
            value = vals[0]
            bits = row_bits
            for _ in range(a_bits):
                cur_shift = cur_shift * cur_shift % P
                cur_omega = cur_omega * cur_omega % P
                cur_log -= 1

        # final polynomial evaluation
        x_final = builder.mul_const(cur_shift,
                                    exp_from_bits(builder, cur_omega, bits))
        acc = alg.constant(0)
        for coeff in reversed(proof_t.fri.final_poly):
            acc = alg.add(alg.mul_base(acc, x_final), coeff)
        alg.connect(acc, value)


def _base_inverse(builder: CircuitBuilder, t: int) -> int:
    """Witnessed base-field inverse with t * inv == 1 enforced."""
    inv = builder.add_virtual_target()

    def gen(w, t=t, inv=inv):
        v = w.get_target(t)
        if v is None:
            return False
        w.set_target(inv, field.h_inverse(v))
        return True
    builder.generators.append(gen)
    builder.gen_descs.append(("inv", t, inv))
    prod = builder.mul(t, inv)
    builder.connect(prod, builder.one())
    return inv
