"""The prover: witness generation -> wire polynomials -> permutation
argument -> quotient -> openings -> FRI (SURVEY.md §3.3's hot path,
reimagined as batched array programs; every per-point computation is a
vectorised pass over the whole LDE domain)."""

from typing import List

import numpy as np

from .. import field, poseidon
from .algebra import BatchAlgebra
from .challenger import Challenger
from .commitment import PolynomialBatch, eval_coeffs_at_ext
from .field_ext import ExtensionField, ext_mul
from .fri import coset_points, fri_prove
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import CHUNK, eval_combined
from .witness import VectorWitness, WitnessConflict, WitnessStore
from . import ntt as nttmod
from .circuit_data import _domain_tags

P = field.P


def _run_generators(circuit_data, pw):
    po = circuit_data.prover_only
    if po.vec_gen is not None:
        from .. import poseidon as _pm
        # checkpoint-loaded circuits carry no generator closures — the
        # vectorised tables are the only engine they have
        if (po.vec_gen["p_in"].shape[0] == 0 or _pm._native()
                or not po.generators):
            return _run_generators_vec(circuit_data, pw)
    w = WitnessStore(po.uf_find)
    for t, v in pw.values.items():
        w.set_target(t, v)
    pending = list(po.generators)
    while pending:
        remaining = [g for g in pending if not g(w)]
        if len(remaining) == len(pending):
            raise RuntimeError(f"witness generation stuck: {len(remaining)} "
                               "generators cannot make progress")
        pending = remaining
    return w


def _scatter(w, ids: np.ndarray, vals: np.ndarray) -> None:
    """Write vals into the dense store with plonky2 conflict semantics."""
    known = w.K[ids]
    if known.any():
        bad = known & (w.V[ids] != vals)
        if bad.any():
            i = int(np.nonzero(bad)[0][0])
            raise WitnessConflict(
                f"witness root {int(ids[i])} set twice with different values: "
                f"{int(w.V[ids[i]])} != {int(vals[i])}")
    if ids.shape[0] > 1:
        order = np.argsort(ids, kind="stable")
        si, sv = ids[order], vals[order]
        dup = si[1:] == si[:-1]
        if dup.any() and bool((sv[1:][dup] != sv[:-1][dup]).any()):
            raise WitnessConflict("witness root set twice within one "
                                  "generation pass with different values")
    w.V[ids] = vals
    w.K[ids] = True


def _run_generators_vec(circuit_data, pw) -> VectorWitness:
    """Vectorised fixpoint: each pass resolves every currently-ready
    generator with array ops (arithmetic rows) and one native batched
    Poseidon trace — the closure walk costs seconds of python dict/union-find
    time per prove on big circuits; this is milliseconds."""
    from .. import native
    po = circuit_data.prover_only
    vg = po.vec_gen
    w = VectorWitness(vg["n_roots"] if "n_roots" in vg else len(vg["root_id"]),
                      vg["root_id"], po.root_map,
                      target_ids=vg.get("target_ids"))
    for t, v in pw.values.items():
        w.set_target(t, v)

    # Native witness VM: the whole generator graph in ONE scheduled C++
    # sweep (the fixpoint below needs one vectorised pass per dependency
    # level — ~870 for the recursion outer circuit's FRI-verifier chains).
    prog = vg.get("prog")
    if prog is not None and native.available():
        code, err = native.run_witness(prog, w.V, w.K)
        if code == 0:
            return w
        if code == 1:
            raise WitnessConflict(
                f"witness cell set twice with different values "
                f"(instruction {err})")
        if code == 3:
            raise ZeroDivisionError("inverse of zero in Goldilocks field")
        raise RuntimeError(
            f"witness generation stuck: instruction {err} cannot make progress")

    if vg["const_ids"].shape[0]:
        _scatter(w, vg["const_ids"], vg["const_vals"])

    # Pending sets are kept as shrinking INDEX arrays — each pass touches
    # only unresolved generators, so total work is O(sum of per-pass pending)
    # instead of O(passes x all generators).
    a_x, a_y, a_z, a_o = vg["a_x"], vg["a_y"], vg["a_z"], vg["a_o"]
    a_c0, a_c1 = vg["a_c0"], vg["a_c1"]
    p_in, p_out = vg["p_in"], vg["p_out"]
    inv_t, inv_o = vg["inv_t"], vg["inv_o"]
    ei_a, ei_o = vg["ei_a"], vg["ei_o"]
    splits = vg["splits"]
    idx_a = np.arange(a_x.shape[0])
    idx_p = np.arange(p_in.shape[0])
    idx_i = np.arange(inv_t.shape[0])
    idx_x = np.arange(ei_a.shape[0])
    idx_s = {nb: np.arange(g[0].shape[0]) for nb, g in splits.items()}
    pend_e = list(vg["eqs"])
    import os as _os
    trace = _os.environ.get("PMT_WITNESS_TRACE") == "1"
    n_pass = 0

    with np.errstate(over="ignore"):
        while True:
            progress = False
            if trace:
                n_pass += 1
                print(f"  pass {n_pass}: arith={idx_a.size} pos={idx_p.size} "
                      f"inv={idx_i.size} extinv={idx_x.size} "
                      f"split={sum(i.size for i in idx_s.values())} "
                      f"eq={len(pend_e)}")
            if idx_a.size:
                ready = w.K[a_x[idx_a]] & w.K[a_y[idx_a]] & w.K[a_z[idx_a]]
                if ready.any():
                    j = idx_a[ready]
                    out = field.add(
                        field.mul(field.mul(a_c0[j], w.V[a_x[j]]), w.V[a_y[j]]),
                        field.mul(a_c1[j], w.V[a_z[j]]))
                    _scatter(w, a_o[j], out)
                    idx_a = idx_a[~ready]
                    progress = True
            if idx_p.size:
                ready = w.K[p_in[idx_p]].all(axis=1)
                if ready.any():
                    j = idx_p[ready]
                    if native.available():
                        traces = native.poseidon_gate_trace_batch(w.V[p_in[j]])
                    else:
                        from .gates import poseidon_gate_trace_batch_np
                        traces = poseidon_gate_trace_batch_np(w.V[p_in[j]])
                    _scatter(w, p_out[j].reshape(-1), traces.reshape(-1))
                    idx_p = idx_p[~ready]
                    progress = True
            if idx_i.size:
                ready = w.K[inv_t[idx_i]]
                if ready.any():
                    j = idx_i[ready]
                    vals = w.V[inv_t[j]]
                    if (vals == 0).any():   # legacy-engine error parity
                        raise ZeroDivisionError(
                            "inverse of zero in Goldilocks field")
                    _scatter(w, inv_o[j], field.inv_vec(vals))
                    idx_i = idx_i[~ready]
                    progress = True
            if idx_x.size:
                ready = w.K[ei_a[idx_x]].all(axis=1)
                if ready.any():
                    j = idx_x[ready]
                    a0 = w.V[ei_a[j, 0]]
                    a1 = w.V[ei_a[j, 1]]
                    from .field_ext import W as _W
                    norm = field.sub(field.mul(a0, a0),
                                     field.mul_small(field.mul(a1, a1), _W))
                    if (norm == 0).any():   # legacy-engine error parity
                        raise ZeroDivisionError(
                            "inverse of zero in Goldilocks field")
                    inv_n = field.inv_vec(norm)
                    out = np.stack([field.mul(a0, inv_n),
                                    field.mul(field.neg(a1), inv_n)], axis=-1)
                    _scatter(w, ei_o[j].reshape(-1), out.reshape(-1))
                    idx_x = idx_x[~ready]
                    progress = True
            for nb, (s_t, s_bits) in splits.items():
                idx = idx_s[nb]
                if not idx.size:
                    continue
                ready = w.K[s_t[idx]]
                if ready.any():
                    j = idx[ready]
                    vals = w.V[s_t[j]]
                    bits = (vals[:, None] >> np.arange(nb, dtype=np.uint64)
                            ) & np.uint64(1)
                    _scatter(w, s_bits[j].reshape(-1), bits.reshape(-1))
                    idx_s[nb] = idx[~ready]
                    progress = True
            if pend_e:
                still = []
                for (xi, yi, bi, ii) in pend_e:
                    if not (w.K[xi] and w.K[yi]):
                        still.append((xi, yi, bi, ii))
                        continue
                    dv = (int(w.V[xi]) - int(w.V[yi])) % P
                    _scatter(w, np.array([bi, ii], dtype=np.int64),
                             np.array([1 if dv == 0 else 0,
                                       0 if dv == 0 else field.h_inverse(dv)],
                                      dtype=np.uint64))
                    progress = True
                pend_e = still
            n_left = (idx_a.size + idx_p.size + idx_i.size + idx_x.size
                      + len(pend_e) + sum(i.size for i in idx_s.values()))
            if n_left == 0:
                return w
            if not progress:
                raise RuntimeError(f"witness generation stuck: {n_left} "
                                   "generators cannot make progress")


def _wire_matrix(circuit_data, w) -> np.ndarray:
    po = circuit_data.prover_only
    n = circuit_data.common.degree
    num_wires = circuit_data.common.config.num_wires
    wires = np.zeros((num_wires, n), dtype=np.uint64)
    if isinstance(w, VectorWitness):
        vg = po.vec_gen
        ids = vg["wm_ids"]
        vals = np.where(w.K[ids], w.V[ids], np.uint64(0))
        wires[vg["wm_cols"], vg["wm_rows"]] = vals
        # side-dict cells (floating roots) — rare
        for root, v in w._side.items():
            if isinstance(root, tuple) and root[0] == "c":
                _, row, col = root
                if row < n and col < num_wires:
                    wires[col, row] = v
        return wires
    vals = w._values
    get = vals.get
    # bulk of the matrix: the build-time-frozen (root, col, row) fill list
    for root, col, row in po.wm_fill:
        v = get(root)
        if v is not None:
            wires[col, row] = v
    # cells first materialised during generation (their own roots)
    wm_cells = po.wm_cells
    for node, v in vals.items():
        if node[0] == "c" and node not in wm_cells:
            _, row, col = node
            if row < n and col < num_wires:
                wires[col, row] = v
    return wires


def _ext_const_sub(base_rows: np.ndarray, y: ExtensionField) -> np.ndarray:
    """(m,) base values minus an ext constant -> (m, 2) ext values."""
    m = base_rows.shape[0]
    out = np.empty((m, 2), dtype=np.uint64)
    out[:, 0] = field.sub(base_rows, np.uint64(y.a0))
    out[:, 1] = np.uint64((P - y.a1) % P)
    return out


def _ext_inv_vec(a: np.ndarray) -> np.ndarray:
    """Vectorised inverse of (m, 2) ext values via conjugate / norm."""
    from .field_ext import W
    a0, a1 = a[:, 0], a[:, 1]
    norm = field.sub(field.mul(a0, a0), field.mul_small(field.mul(a1, a1), W))
    inv_n = field.inv_vec(norm)
    return np.stack([field.mul(a0, inv_n),
                     field.mul(field.neg(a1), inv_n)], axis=-1)


def _combine_batch(lde_rows: np.ndarray, ys: List[ExtensionField],
                   alpha: ExtensionField) -> np.ndarray:
    """sum_j alpha^j (p_j(x) - y_j) over (num_polys, m) base LDE rows."""
    m = lde_rows.shape[1]
    acc = np.zeros((m, 2), dtype=np.uint64)
    alpha_arr = np.broadcast_to(np.array([alpha.a0, alpha.a1], dtype=np.uint64),
                                (m, 2))
    for j in range(lde_rows.shape[0] - 1, -1, -1):
        acc = ext_mul(acc, alpha_arr)
        acc = field.add(acc, _ext_const_sub(lde_rows[j], ys[j]))
    return acc


def prove(circuit_data, pw) -> ProofWithPublicInputs:
    common = circuit_data.common
    po = circuit_data.prover_only
    vo = circuit_data.verifier_only
    config = common.config
    fri_cfg = config.fri_config
    n = common.degree
    m = common.lde_size
    nc = config.num_challenges
    r_wires = config.num_routed_wires
    num_chunks = r_wires // CHUNK

    # 1-2. witness + wire matrix + public inputs
    w = _run_generators(circuit_data, pw)
    wires = _wire_matrix(circuit_data, w)

    # zero-knowledge: fill the reserved blinding rows with fresh random
    # values (hides wire-poly openings at zeta) and salt every witness
    # oracle's Merkle leaves below (hides query-round reveals).  Mirrors
    # plonky2 0.1.3's blind_and_pad + salted PolynomialBatch; the reference
    # itself never proves in zk, so transcripts for zk=false are unchanged.
    salt_rng = None
    if config.zero_knowledge:
        import os as _os
        seed = _os.environ.get("PMT_ZK_SEED")
        salt_rng = np.random.default_rng(int(seed)) if seed \
            else np.random.default_rng()
        brows = np.asarray(common.blinding_rows, dtype=np.int64)
        if brows.size:
            wires[:, brows] = salt_rng.integers(
                0, P, size=(wires.shape[0], brows.size), dtype=np.uint64)
    pi_values = []
    for t in po.public_inputs:
        v = w.get_target(t)
        if v is None:
            raise RuntimeError(f"public input target {t} was never set")
        pi_values.append(v)
    pi_hash = poseidon.hash_no_pad_scalar(pi_values) if pi_values \
        else np.zeros(4, dtype=np.uint64)

    # 3. commit wires
    wires_batch = PolynomialBatch.from_values(wires, fri_cfg.rate_bits,
                                              fri_cfg.cap_height,
                                              salt_rng=salt_rng)

    ch = Challenger()
    ch.observe_hash(vo.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_batch.cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)

    # 4. permutation argument: Z + partial products per challenge set
    tags = _domain_tags(n, common.k_is)            # (R, N)
    sigmas = po.sigmas                             # (R, N)
    routed = wires[:r_wires]
    zsp_rows = []
    partial_rows = {c: [] for c in range(nc)}
    for c in range(nc):
        beta = np.uint64(betas[c])
        gamma = np.uint64(gammas[c])
        with np.errstate(over="ignore"):
            f = field.add(routed, field.add(field.mul(tags, beta), gamma))
            g = field.add(routed, field.add(field.mul(sigmas, beta), gamma))
        ratios = []
        for j in range(num_chunks):
            fj = f[CHUNK * j]
            gj = g[CHUNK * j]
            for i in range(CHUNK * j + 1, CHUNK * (j + 1)):
                fj = field.mul(fj, f[i])
                gj = field.mul(gj, g[i])
            ratios.append(field.mul(fj, field.inv_vec(gj)))
        ratio_all = ratios[0]
        for rr in ratios[1:]:
            ratio_all = field.mul(ratio_all, rr)
        z = field.prefix_prod_exclusive(ratio_all)
        closure = int(field.mul(z[-1], ratio_all[-1]))
        if closure != 1:
            raise RuntimeError("permutation product does not close")
        zsp_rows.append(z)
        prod = z
        for j in range(num_chunks - 1):
            prod = field.mul(prod, ratios[j])
            partial_rows[c].append(prod)
    for c in range(nc):
        zsp_rows.extend(partial_rows[c])
    zsp_values = np.stack(zsp_rows, axis=0)       # (nc + nc*(chunks-1), N)
    zsp_batch = PolynomialBatch.from_values(zsp_values, fri_cfg.rate_bits,
                                            fri_cfg.cap_height,
                                            salt_rng=salt_rng)
    ch.observe_cap(zsp_batch.cap)
    alphas = ch.get_n_challenges(nc)

    # 5. quotient polynomials
    xs = coset_points(common.lde_bits, field.MULTIPLICATIVE_GROUP_GENERATOR)
    alg = BatchAlgebra(np, m)
    # np.asarray: the constants/sigmas oracle may be device-built
    pre_lde = np.asarray(po.constants_sigmas_batch.lde_values)
    num_sel = common.selectors.shape[0]
    sel_rows = [pre_lde[i] for i in range(num_sel)]
    const_rows = [pre_lde[num_sel + i] for i in range(2)]
    sigma_rows = [pre_lde[num_sel + 2 + i] for i in range(r_wires)]
    wire_rows = [wires_batch.lde_values[i] for i in range(config.num_wires)]
    zs_rows = [zsp_batch.lde_values[c] for c in range(nc)]
    rate = 1 << fri_cfg.rate_bits
    zs_next_rows = [np.roll(zr, -rate) for zr in zs_rows]
    partials_lde = {
        c: [zsp_batch.lde_values[nc + c * (num_chunks - 1) + j]
            for j in range(num_chunks - 1)]
        for c in range(nc)
    }
    pi_hash_alg = [alg.constant(int(v)) for v in pi_hash]

    with np.errstate(over="ignore"):
        zh = field.sub(field.exp_vec(xs, n), np.uint64(1))
        l0 = field.mul(zh, field.inv_vec(
            field.mul_small(field.sub(xs, np.uint64(1)), n % P)))
        combined = eval_combined(
            alg, r_wires, common.k_is, xs, wire_rows, sel_rows, const_rows,
            sigma_rows, zs_rows, zs_next_rows, partials_lde,
            [np.uint64(b) for b in betas], [np.uint64(g) for g in gammas],
            [np.uint64(a) for a in alphas], pi_hash_alg, l0)
        zh_inv = field.inv_vec(zh)
        quotient_chunks = []
        for c in range(nc):
            t_vals = field.mul(combined[c], zh_inv)
            t_coeffs = np.asarray(nttmod.coset_intt(t_vals), dtype=np.uint64)
            for i in range(m // n):
                quotient_chunks.append(t_coeffs[i * n:(i + 1) * n])
    q_batch = PolynomialBatch.from_coeffs(np.stack(quotient_chunks, axis=0),
                                          fri_cfg.rate_bits, fri_cfg.cap_height,
                                          salt_rng=salt_rng)
    ch.observe_cap(q_batch.cap)
    zeta = ch.get_extension_challenge()

    # 6. openings
    omega = field.primitive_root_of_unity(common.degree_bits)
    zeta_next = zeta * ExtensionField(omega)
    zsp_evals = zsp_batch.eval_at_ext(zeta)
    openings = OpeningSet(
        constants_sigmas=po.constants_sigmas_batch.eval_at_ext(zeta),
        wires=wires_batch.eval_at_ext(zeta),
        zs=zsp_evals[:nc],
        partials=zsp_evals[nc:],
        quotient=q_batch.eval_at_ext(zeta),
        zs_next=eval_coeffs_at_ext(zsp_batch.coeffs[:nc], zeta_next),
    )
    for e in openings.flat():
        ch.observe_extension(e)

    # 7. FRI on the combined opening polynomial
    fri_alpha = ch.get_extension_challenge()
    oracles = [po.constants_sigmas_batch, wires_batch, zsp_batch, q_batch]
    all_rows = np.concatenate([o.lde_values for o in oracles], axis=0)
    ys1 = (openings.constants_sigmas + openings.wires + openings.zs
           + openings.partials + openings.quotient)
    with np.errstate(over="ignore"):
        r1 = _combine_batch(all_rows, ys1, fri_alpha)
        inv1 = _ext_inv_vec(_ext_const_sub(xs, zeta))
        f_vals = ext_mul(r1, inv1)
        r2 = _combine_batch(zsp_batch.lde_values[:nc], openings.zs_next, fri_alpha)
        inv2 = _ext_inv_vec(_ext_const_sub(xs, zeta_next))
        shift = fri_alpha ** all_rows.shape[0]
        shift_arr = np.broadcast_to(
            np.array([shift.a0, shift.a1], dtype=np.uint64), (m, 2))
        f_vals = field.add(f_vals, ext_mul(shift_arr, ext_mul(r2, inv2)))
        fri_proof = fri_prove(f_vals, oracles, ch, fri_cfg, common.degree_bits)

    proof = Proof(wires_cap=np.asarray(wires_batch.cap),
                  zs_partial_cap=np.asarray(zsp_batch.cap),
                  quotient_cap=np.asarray(q_batch.cap),
                  openings=openings, fri=fri_proof)
    return ProofWithPublicInputs(proof=proof, public_inputs=pi_values)
