"""Combined constraint ("vanishing polynomial") evaluation.

One implementation, two executions (see algebra.py): the prover evaluates
over all quotient-domain points as batched uint64 arrays, the verifier at
the single extension point zeta.  Constraint enumeration order is part of
the protocol:

  [gate constraints, selector-filtered, registry order]
  then per challenge set: L0*(Z-1), the R/8 partial-product chunk links
  (the last linking to Z(omega*x)), combined with powers of alpha_c.
"""

import numpy as np

from .gates import GATE_REGISTRY
from .algebra import BatchAlgebra
from .. import field

P = field.P
CHUNK = 8  # routed-wire factors per partial product


def eval_gate_constraints(alg, selectors, wires, constants, pi_hash):
    """All gates' constraints, each multiplied by its selector column."""
    out = []
    for gi, gate in enumerate(GATE_REGISTRY):
        for c in gate.eval(alg, wires, constants, pi_hash):
            out.append(alg.mul(selectors[gi], c))
    return out


def _gate_kernel_on(xp) -> bool:
    """Auto-dispatch for the fused Pallas gate-constraint kernel
    (ops/gate_kernel.py): traced (jnp) execution on a TPU backend.
    PMT_GATE_KERNEL=1 forces (interpret mode off-TPU), =0 disables."""
    if xp is np:
        return False
    import os
    flag = os.environ.get("PMT_GATE_KERNEL", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    import jax
    return jax.default_backend() == "tpu"


def eval_combined(alg, num_routed, k_is, x, wires, selectors, constants, sigmas,
                  zs, zs_next, partials, betas, gammas, alphas, pi_hash, l0,
                  gate_kernel=None):
    """Returns [C_c] for each challenge set c — the full combined constraint.

    ALL value arguments — including the beta/gamma/alpha challenges — are
    alg elements, so the same code runs vectorised (prover), at zeta
    (verifier), and over circuit targets (recursive verifier).  The batched
    (prover) execution takes a stacked-array fast path producing
    bit-identical values with a ~50x smaller traced program.
    """
    if isinstance(alg, BatchAlgebra):
        return _eval_combined_batch(
            alg, num_routed, k_is, x, wires, selectors, constants, sigmas,
            zs, zs_next, partials, betas, gammas, alphas, pi_hash, l0,
            gate_kernel=gate_kernel)
    gate_terms = eval_gate_constraints(alg, selectors, wires, constants, pi_hash)
    num_chunks = num_routed // CHUNK
    out = []
    for c in range(len(zs)):
        beta, gamma = betas[c], gammas[c]
        terms = list(gate_terms)
        # Z starts at 1
        terms.append(alg.mul(l0, alg.sub(zs[c], alg.constant(1))))
        # chunked running products
        prev = zs[c]
        for j in range(num_chunks):
            f = None
            g = None
            for i in range(CHUNK * j, CHUNK * (j + 1)):
                fi = alg.add(alg.add(alg.mul(beta, alg.mul_const(x, k_is[i])),
                                     gamma), wires[i])
                gi = alg.add(alg.add(alg.mul(beta, sigmas[i]), gamma), wires[i])
                f = fi if f is None else alg.mul(f, fi)
                g = gi if g is None else alg.mul(g, gi)
            nxt = partials[c][j] if j < num_chunks - 1 else zs_next[c]
            terms.append(alg.sub(alg.mul(nxt, g), alg.mul(prev, f)))
            if j < num_chunks - 1:
                prev = partials[c][j]
        # Horner-combine with alpha_c
        acc = alg.constant(0)
        for t in reversed(terms):
            acc = alg.add(alg.mul(acc, alphas[c]), t)
        out.append(acc)
    return out


def _powers_vec(xp, base, count: int):
    """(count,) array [1, base, base^2, ...] for a dynamic scalar ``base``
    via log2(count) doubling multiplies."""
    powers = xp.ones((1,), dtype=xp.uint64)
    cur = base
    while powers.shape[0] < count:
        k = min(powers.shape[0], count - powers.shape[0])
        powers = xp.concatenate([powers, field.mul(powers[:k], cur)])
        cur = field.mul(cur, cur)
    return powers


def _prod_axis1(arr):
    """(k, c, m) -> (k, m) product over axis 1 by pairwise folding (c is a
    power of two; mod-p multiplication is associative, so the fold equals the
    sequential product exactly)."""
    while arr.shape[1] > 1:
        half = arr.shape[1] // 2
        arr = field.mul(arr[:, :half], arr[:, half:])
    return arr[:, 0]


def _eval_combined_batch(alg, num_routed, k_is, x, wires, selectors, constants,
                         sigmas, zs, zs_next, partials, betas, gammas, alphas,
                         pi_hash, l0, gate_kernel=None):
    """Stacked-array evaluation: same constraint order/values as the generic
    path (each step is the same exact mod-p arithmetic, reassociated only
    where the operation is associative-commutative on canonical values)."""
    xp = alg.xp
    num_chunks = num_routed // CHUNK

    use_kernel = gate_kernel if gate_kernel is not None else _gate_kernel_on(xp)

    import os
    m_pts = int(xp.asarray(x).shape[0])
    block = next((b for b in (1024, 512, 256, 128) if m_pts % b == 0), None)
    if (use_kernel and os.environ.get("PMT_FULL_KERNEL", "1") != "0"
            and num_routed % CHUNK == 0 and block is not None):
        # one fused Pallas pass for the WHOLE combined constraint — gate
        # terms + L0*(Z-1) + permutation chunk links (ops/gate_kernel.py
        # combined_fold_pallas); bit-identical values to the path below
        from ..ops.gate_kernel import (
            NUM_GATE_TERMS, POSEIDON_WIRES, combined_fold_pallas)
        from .gates import GATE_INDEX
        interp = os.environ.get("PMT_GATE_KERNEL") == "1" and \
            __import__("jax").default_backend() != "tpu"
        nc = len(zs)
        num_chunks = num_routed // CHUNK
        w130 = xp.stack([wires[i] for i in range(POSEIDON_WIRES)])
        sel4 = xp.stack([selectors[GATE_INDEX[g]] for g in
                         ("arithmetic", "constant", "public_input",
                          "poseidon")])
        const2 = xp.stack([constants[0], constants[1]])
        sig = xp.stack([sigmas[i] for i in range(num_routed)])
        zstack = xp.stack(
            [row for c in range(nc)
             for row in [zs[c]] + list(partials[c]) + [zs_next[c]]])
        l0_x = xp.stack([l0, x])
        pi_vec = xp.stack([xp.asarray(pi_hash[i]).reshape(-1)[0]
                           for i in range(4)])
        apow = xp.stack([_powers_vec(xp, alphas[c],
                                     NUM_GATE_TERMS + 1 + num_chunks)
                         for c in range(nc)])
        beta_vec = xp.stack([xp.asarray(betas[c]).reshape(()) for c in
                             range(nc)])
        gamma_vec = xp.stack([xp.asarray(gammas[c]).reshape(()) for c in
                              range(nc)])
        k_tuple = tuple(int(k) % P for k in k_is)
        out = combined_fold_pallas(w130, sel4, const2, sig, zstack, l0_x,
                                   pi_vec, apow, beta_vec, gamma_vec,
                                   k_tuple, block=block, interpret=interp)
        return [out[c] for c in range(nc)]

    gate_folds = None
    if use_kernel:
        # fused Pallas kernel: per challenge set, the alpha-power fold of
        # ALL gate terms (positions 0..131) in one pass — bit-identical
        # values to the XLA path below (ops/gate_kernel.py)
        from ..ops.gate_kernel import (
            NUM_GATE_TERMS, gate_terms_fold_pallas, POSEIDON_WIRES)
        from .gates import GATE_INDEX
        import os
        interp = os.environ.get("PMT_GATE_KERNEL") == "1" and \
            __import__("jax").default_backend() != "tpu"
        w130 = xp.stack([wires[i] for i in range(POSEIDON_WIRES)])
        sel4 = xp.stack([selectors[GATE_INDEX[g]] for g in
                         ("arithmetic", "constant", "public_input",
                          "poseidon")])
        const2 = xp.stack([constants[0], constants[1]])
        pi_vec = xp.stack([xp.asarray(pi_hash[i]).reshape(-1)[0]
                           for i in range(4)])
        apow = xp.stack([_powers_vec(xp, alphas[c], NUM_GATE_TERMS)
                         for c in range(len(zs))])
        gate_folds = gate_terms_fold_pallas(w130, sel4, const2, pi_vec, apow,
                                            interpret=interp)
    else:
        gate_terms = eval_gate_constraints(alg, selectors, wires, constants,
                                           pi_hash)

    routed = xp.stack([wires[i] for i in range(num_routed)])      # (R, m)
    sig = xp.stack([sigmas[i] for i in range(num_routed)])        # (R, m)
    k_col = xp.asarray(np.array([k % P for k in k_is],
                                dtype=np.uint64))[:, None]        # (R, 1)
    kx = field.mul(k_col, x[None, :])                             # (R, m)

    out = []
    for c in range(len(zs)):
        beta, gamma = betas[c], gammas[c]
        f_all = field.add(field.add(field.mul(kx, beta), gamma), routed)
        g_all = field.add(field.add(field.mul(sig, beta), gamma), routed)
        m_pts = f_all.shape[1]
        f_prod = _prod_axis1(f_all.reshape(num_chunks, CHUNK, m_pts))
        g_prod = _prod_axis1(g_all.reshape(num_chunks, CHUNK, m_pts))
        prev_stack = xp.stack([zs[c]] + [partials[c][j]
                                         for j in range(num_chunks - 1)])
        nxt_stack = xp.stack([partials[c][j] for j in range(num_chunks - 1)]
                             + [zs_next[c]])
        chunk_terms = field.sub(field.mul(nxt_stack, g_prod),
                                field.mul(prev_stack, f_prod))   # (chunks, m)

        z0_term = field.mul(l0, field.sub(zs[c], xp.ones((), dtype=xp.uint64)))
        if gate_folds is not None:
            # gate terms already alpha-folded in-kernel (weight 1); the
            # trailing terms keep their absolute alpha powers 132, 133, ...
            from ..ops.gate_kernel import NUM_GATE_TERMS
            tail = xp.concatenate([z0_term[None, :], chunk_terms], axis=0)
            pw_all = _powers_vec(xp, alphas[c],
                                 NUM_GATE_TERMS + 1 + chunk_terms.shape[0])
            pw = xp.concatenate(
                [xp.ones((1,), dtype=xp.uint64), pw_all[NUM_GATE_TERMS:]])
            terms = xp.concatenate([gate_folds[c][None, :], tail], axis=0)
        else:
            terms = xp.concatenate(
                [xp.stack(gate_terms), z0_term[None, :], chunk_terms], axis=0)
            pw = _powers_vec(xp, alphas[c], terms.shape[0])
        # Horner over reversed(terms) == sum_t alpha^t * terms[t]
        weighted = field.mul(pw[:, None], terms)
        while weighted.shape[0] > 1:
            half = weighted.shape[0] // 2
            head = field.add(weighted[:half], weighted[half:2 * half])
            if weighted.shape[0] % 2:
                head = xp.concatenate([head, weighted[2 * half:]], axis=0)
            weighted = head
        out.append(weighted[0])
    return out
