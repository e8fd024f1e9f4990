"""Native proof verifier: transcript replay, vanishing check at zeta, FRI.

Mirrors ``CircuitData::verify`` (SURVEY.md §2.2); raises nothing itself —
returns bool, CircuitData.verify wraps it with the reference's panic
behaviour.
"""


import numpy as np

from .. import field, poseidon
from .algebra import ExtAlgebra
from .challenger import Challenger
from .field_ext import ExtensionField
from .fri import fri_verify
from .proof import ProofWithPublicInputs
from .vanishing import CHUNK, eval_combined

P = field.P


class _VerifyTape:
    """Recorded straight-line tape of the combined-constraint evaluation at
    zeta (circuit-static op sequence, per-proof inputs).  Replayed by the
    native library's gp_ext_tape: ~12k Python ExtensionField ops -> one C
    call (the verifier's former top scalar cost, VERDICT r4 weak #2)."""

    __slots__ = ("instrs", "n_regs", "const_idx", "const_vals",
                 "input_idx", "out_regs")

    def __init__(self, rec, out_regs):
        self.instrs = np.asarray(rec.instrs, dtype=np.int32).reshape(-1, 4)
        self.n_regs = rec.n_regs
        self.const_idx = np.asarray([r for r, _, _ in rec.const_inits],
                                    dtype=np.int64)
        self.const_vals = np.asarray([(a0, a1) for _, a0, a1 in rec.const_inits],
                                     dtype=np.uint64).reshape(-1, 2)
        self.input_idx = np.asarray(rec.input_regs, dtype=np.int64)
        self.out_regs = list(out_regs)

    def run(self, values) -> list:
        """values: ExtensionField inputs in recording order -> outputs."""
        from ..native import ext_tape
        regs = np.zeros((self.n_regs, 2), dtype=np.uint64)
        if len(self.const_idx):
            regs[self.const_idx] = self.const_vals
        regs[self.input_idx] = np.asarray(
            [(v.a0, v.a1) for v in values], dtype=np.uint64)
        ext_tape(self.instrs, regs)
        return [ExtensionField(int(regs[r, 0]), int(regs[r, 1]))
                for r in self.out_regs]


def _get_verify_tape(common):
    """Build (once per circuit per process) the recorded eval_combined tape,
    or None when the native library is unavailable (scalar fallback)."""
    tape = getattr(common, "_verify_tape", None)
    if tape is not None:
        return tape if tape != "unavailable" else None
    from .. import native
    if not native.available():
        common._verify_tape = "unavailable"
        return None
    from .algebra import RecordingAlgebra
    config = common.config
    nc = config.num_challenges
    r_wires = config.num_routed_wires
    num_chunks = r_wires // CHUNK
    num_sel = common.selectors.shape[0]
    rec = RecordingAlgebra()
    # input registers in the EXACT order verify() fills them (below)
    x = rec.input()
    wires = [rec.input() for _ in range(config.num_wires)]
    sels = [rec.input() for _ in range(num_sel)]
    consts = [rec.input() for _ in range(2)]
    sigmas = [rec.input() for _ in range(r_wires)]
    zs = [rec.input() for _ in range(nc)]
    zs_next = [rec.input() for _ in range(nc)]
    partials = {c: [rec.input() for _ in range(num_chunks - 1)]
                for c in range(nc)}
    betas = [rec.input() for _ in range(nc)]
    gammas = [rec.input() for _ in range(nc)]
    alphas = [rec.input() for _ in range(nc)]
    pi_hash = [rec.input() for _ in range(4)]
    l0 = rec.input()
    out = eval_combined(
        rec, r_wires, common.k_is, x, wires, sels, consts, sigmas,
        zs, zs_next, partials, betas, gammas, alphas, pi_hash, l0)
    tape = _VerifyTape(rec, out)
    common._verify_tape = tape
    return tape


def verify(circuit_data, pwpi: ProofWithPublicInputs) -> bool:
    common = circuit_data.common
    vo = circuit_data.verifier_only
    config = common.config
    fri_cfg = config.fri_config
    n = common.degree
    nc = config.num_challenges
    r_wires = config.num_routed_wires
    num_chunks = r_wires // CHUNK
    proof = pwpi.proof
    op = proof.openings

    if len(pwpi.public_inputs) != common.num_public_inputs:
        return False
    pi_hash = poseidon.hash_no_pad_scalar(pwpi.public_inputs) \
        if pwpi.public_inputs else np.zeros(4, dtype=np.uint64)

    # --- transcript replay ---
    ch = Challenger()
    ch.observe_hash(vo.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(proof.wires_cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.zs_partial_cap)
    alphas = ch.get_n_challenges(nc)
    ch.observe_cap(proof.quotient_cap)
    zeta = ch.get_extension_challenge()
    ch.observe_elements(
        v for e in op.flat() for v in e.to_basefield_array())
    fri_alpha = ch.get_extension_challenge()

    # --- vanishing check at zeta ---
    alg = ExtAlgebra()
    num_sel = common.selectors.shape[0]
    sels = op.constants_sigmas[:num_sel]
    consts = op.constants_sigmas[num_sel:num_sel + 2]
    sigmas = op.constants_sigmas[num_sel + 2:num_sel + 2 + r_wires]
    partials = {c: op.partials[c * (num_chunks - 1):(c + 1) * (num_chunks - 1)]
                for c in range(nc)}
    pi_hash_ext = [ExtensionField(int(v)) for v in pi_hash]

    zeta_pow_n = zeta ** n
    zh = zeta_pow_n - 1
    if zh.is_zero():
        return False
    l0 = zh / ((zeta - 1) * n)
    betas_e = [ExtensionField(b) for b in betas]
    gammas_e = [ExtensionField(g) for g in gammas]
    alphas_e = [ExtensionField(a) for a in alphas]
    # opening-vector shapes must match the circuit before any evaluation
    if (len(op.wires) != config.num_wires or len(sels) != num_sel
            or len(consts) != 2 or len(sigmas) != r_wires or len(op.zs) != nc
            or len(op.zs_next) != nc
            or any(len(partials[c]) != num_chunks - 1 for c in range(nc))):
        return False
    tape = _get_verify_tape(common)
    if tape is not None:
        values = ([zeta] + list(op.wires) + list(sels) + list(consts)
                  + list(sigmas) + list(op.zs) + list(op.zs_next)
                  + [p for c in range(nc) for p in partials[c]]
                  + betas_e + gammas_e + alphas_e + pi_hash_ext + [l0])
        combined = tape.run(values)
    else:
        combined = eval_combined(
            alg, r_wires, common.k_is, zeta, op.wires, sels, consts, sigmas,
            op.zs, op.zs_next, partials,
            betas_e, gammas_e, alphas_e, pi_hash_ext, l0)

    for c in range(nc):
        t_at_zeta = ExtensionField(0)
        chunks = op.quotient[c * (1 << fri_cfg.rate_bits):
                             (c + 1) * (1 << fri_cfg.rate_bits)]
        for chunk in reversed(chunks):
            t_at_zeta = t_at_zeta * zeta_pow_n + chunk
        if combined[c] != zh * t_at_zeta:
            return False

    # --- FRI ---
    omega = field.primitive_root_of_unity(common.degree_bits)
    zeta_next = zeta * ExtensionField(omega)
    ys1 = (op.constants_sigmas + op.wires + op.zs + op.partials + op.quotient)
    n1 = len(ys1)
    lde_shift = field.MULTIPLICATIVE_GROUP_GENERATOR
    lde_omega = field.primitive_root_of_unity(common.lde_bits)

    # expected leaf sizes per oracle (shape check before recombination);
    # zero-knowledge proofs carry 4 salt elements per witness-oracle leaf
    # (wires / Z+partials / quotient — never the public preprocessed oracle)
    zk_salt = 4 if config.zero_knowledge else 0
    real_sizes = [num_sel + 2 + r_wires, config.num_wires,
                  nc * num_chunks, nc * (1 << fri_cfg.rate_bits)]
    oracle_sizes = [real_sizes[0]] + [s + zk_salt for s in real_sizes[1:]]

    def compute_initial_eval(indices, query_rounds) -> np.ndarray:
        """Batched recombination F(x_index) for ALL query rounds at once:
        (n_q, 2) numpy extension arithmetic — the exact vectorised twin of
        the per-query Horner walk (sum_j alpha^j (v_j - y_j), grouped
        pairwise: mod-p addition is associative)."""
        from .field_ext import (base_to_ext, ext_inv_vec, ext_mul,
                                ext_powers_host, ext_sub)
        for qr in query_rounds:
            if len(qr.initial.leaf_values) != 4:
                raise ValueError("bad oracle count")
            for lv, size in zip(qr.initial.leaf_values, oracle_sizes):
                if len(lv) != size:
                    raise ValueError("bad oracle leaf size")
        n_q = len(query_rounds)
        x = np.asarray([lde_shift * pow(lde_omega, int(i), P) % P
                        for i in indices], dtype=np.uint64)
        # recombine only the real polynomial values (salt is hashed into the
        # leaf for the Merkle check but is not part of any polynomial)
        vals = np.stack(
            [np.concatenate([np.asarray(lv, dtype=np.uint64)[:rs]
                             for lv, rs in zip(qr.initial.leaf_values,
                                               real_sizes)])
             for qr in query_rounds])                      # (n_q, n1)
        ys = np.asarray([(y.a0, y.a1) for y in ys1],
                        dtype=np.uint64)                   # (n1, 2)
        apow = ext_powers_host(fri_alpha, n1 + 1)          # (n1+1, 2)
        from .. import native
        if native.available():
            acc1 = native.ext_dot(vals, ys, apow[:n1])     # (n_q, 2)
        else:
            diff0 = field.sub(vals, ys[None, :, 0])
            diff = np.stack(
                [diff0, np.broadcast_to(field.neg(ys[:, 1]), diff0.shape)],
                axis=-1)                                   # (n_q, n1, 2)
            terms = ext_mul(np.broadcast_to(apow[None, :n1], diff.shape), diff)
            while terms.shape[1] > 1:                      # pairwise mod-p sum
                h = terms.shape[1] // 2
                head = field.add(terms[:, :h], terms[:, h:2 * h])
                if terms.shape[1] % 2:
                    head = np.concatenate([head, terms[:, 2 * h:]], axis=1)
                terms = head
            acc1 = terms[:, 0]                             # (n_q, 2)
        zeta_arr = np.array([zeta.a0, zeta.a1], dtype=np.uint64)
        zeta_next_arr = np.array([zeta_next.a0, zeta_next.a1],
                                 dtype=np.uint64)
        result = ext_mul(acc1, ext_inv_vec(
            ext_sub(base_to_ext(x), zeta_arr[None, :])))
        zs_off = real_sizes[0] + real_sizes[1]
        zs_leaf = vals[:, zs_off:zs_off + nc]              # (n_q, nc)
        yzn = np.asarray([(y.a0, y.a1) for y in op.zs_next],
                         dtype=np.uint64)                  # (nc, 2)
        if native.available():
            acc2 = native.ext_dot(zs_leaf, yzn, apow[:nc])
        else:
            d0 = field.sub(zs_leaf, yzn[None, :, 0])
            d = np.stack([d0, np.broadcast_to(field.neg(yzn[:, 1]), d0.shape)],
                         axis=-1)
            t2 = ext_mul(np.broadcast_to(apow[None, :nc], d.shape), d)
            while t2.shape[1] > 1:
                h = t2.shape[1] // 2
                head = field.add(t2[:, :h], t2[:, h:2 * h])
                if t2.shape[1] % 2:
                    head = np.concatenate([head, t2[:, 2 * h:]], axis=1)
                t2 = head
            acc2 = t2[:, 0]
        term2 = ext_mul(acc2, ext_inv_vec(
            ext_sub(base_to_ext(x), zeta_next_arr[None, :])))
        result = field.add(result, ext_mul(
            np.broadcast_to(apow[n1], term2.shape), term2))
        return result

    oracle_caps = [vo.constants_sigmas_cap, proof.wires_cap,
                   proof.zs_partial_cap, proof.quotient_cap]
    try:
        return fri_verify(proof.fri, compute_initial_eval, oracle_caps, ch,
                          fri_cfg, common.degree_bits, common.lde_bits)
    except (ValueError, IndexError):
        return False
