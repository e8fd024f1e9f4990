"""Combined constraint ("vanishing polynomial") evaluation.

One implementation, two executions (see algebra.py): the prover evaluates
over all quotient-domain points as batched uint64 arrays, the verifier at
the single extension point zeta.  Constraint enumeration order is part of
the protocol:

  [gate constraints, selector-filtered, registry order]
  then per challenge set: L0*(Z-1), the R/8 partial-product chunk links
  (the last linking to Z(omega*x)), combined with powers of alpha_c.
"""

from .gates import GATE_REGISTRY
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


def eval_combined(alg, num_routed, k_is, x, wires, selectors, constants, sigmas,
                  zs, zs_next, partials, betas, gammas, alphas, pi_hash, l0):
    """Returns [C_c] for each challenge set c — the full combined constraint.

    ALL value arguments — including the beta/gamma/alpha challenges — are
    alg elements, so the same code runs vectorised (prover), at zeta
    (verifier), and over circuit targets (recursive verifier).
    """
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
