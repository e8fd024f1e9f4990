"""FRI low-degree proof: commit-phase folding, PoW grinding, query rounds.

The combined polynomial's LDE-coset evaluations (extension field, (M, 2)
arrays) are folded arity-by-arity; each committed layer's Merkle leaves are
whole folding cosets, so one query opening authenticates everything a fold
check needs.  Binary folds iterate with beta, beta^2, beta^4, ... which
equals the arity-wide coefficient fold sum_k beta^k F_k(y).

Query rounds open the ORIGINAL oracles at the sampled index (the verifier
recombines them into F(x) itself), then walk the layers — the same shape as
plonky2's FriProof (SURVEY.md §2.2 "FRI folding rounds").
"""

import os
from dataclasses import dataclass
from functools import lru_cache
from typing import List

import numpy as np

from .. import field, poseidon
from .challenger import Challenger
from .commitment import MerkleCommitment
from .field_ext import ExtensionField
from . import ntt as nttmod

P = field.P


# -- domain tables ------------------------------------------------------------

@lru_cache(maxsize=None)
def coset_points(log_m: int, shift: int) -> np.ndarray:
    """Points shift * omega^i of the size-2^log_m coset (natural order)."""
    m = 1 << log_m
    w = field.primitive_root_of_unity(log_m)
    with np.errstate(over="ignore"):
        return field.mul(field.powers_host(w, m), np.uint64(shift % P))


@lru_cache(maxsize=None)
def zh_tables(degree_bits: int, rate_bits: int, shift: int):
    """Period tables for Z_H(x) = x^n - 1 on the natural-order LDE coset.

    With x_i = shift * omega^i and omega of order m = n * rate,
    x_i^n = shift^n * omega^(n * (i mod rate)) — Z_H is ``rate``-periodic,
    so its values (and their inverses) are ``rate`` host-computable
    constants instead of an in-program exp_vec + inv_vec over all m points.
    Python-int exact: identical canonical values to the chains replaced."""
    n = 1 << degree_bits
    rate = 1 << rate_bits
    w = int(field.primitive_root_of_unity(rate_bits))
    s_n = pow(shift % field.P, n, field.P)
    zh = [(s_n * pow(w, j, field.P) - 1) % field.P for j in range(rate)]
    zh_inv = [pow(v, field.P - 2, field.P) for v in zh]
    return (np.array(zh, dtype=np.uint64), np.array(zh_inv, dtype=np.uint64))


@lru_cache(maxsize=None)
def _inv_2x(log_m: int, shift: int) -> np.ndarray:
    """1 / (2 * x_i) for the first half of the coset (fold denominators)."""
    pts = coset_points(log_m, shift)[: (1 << log_m) // 2]
    with np.errstate(over="ignore"):
        return field.inv_vec(field.mul_small(pts, 2))


def _ext_broadcast_mul(values: np.ndarray, base: np.ndarray) -> np.ndarray:
    """(M, 2) ext array times (M,) base array."""
    return np.stack([field.mul(values[:, 0], base),
                     field.mul(values[:, 1], base)], axis=-1)


def _ext_scalar_mul(values: np.ndarray, s: ExtensionField) -> np.ndarray:
    from .field_ext import ext_mul
    sv = np.broadcast_to(np.array([s.a0, s.a1], dtype=np.uint64), values.shape)
    return ext_mul(values, sv)


def fold_binary(values: np.ndarray, beta: ExtensionField, log_m: int,
                shift: int) -> np.ndarray:
    """F'(x^2) = (F(x) + F(-x))/2 + beta * (F(x) - F(-x)) / (2x)."""
    m = values.shape[0]
    half = m // 2
    a, b = values[:half], values[half:]
    s = field.add(a, b)
    d = field.sub(a, b)
    half_inv = field.h_inverse(2)
    term1 = _ext_broadcast_mul(s, np.full(half, np.uint64(half_inv)))
    term2 = _ext_scalar_mul(_ext_broadcast_mul(d, _inv_2x(log_m, shift)), beta)
    return field.add(term1, term2)


def _group_coset_leaves(values: np.ndarray, arity_bits: int) -> np.ndarray:
    """(M, 2) values -> (M/2^a, 2^a * 2) leaves; leaf j holds the values at
    indices {j + t*M/2^a}."""
    m = values.shape[0]
    a = 1 << arity_bits
    return np.ascontiguousarray(
        values.reshape(a, m // a, 2).transpose(1, 0, 2).reshape(m // a, a * 2))


# -- proof structures -----------------------------------------------------------

@dataclass
class FriInitialOpening:
    """Per-oracle leaf opening at the queried LDE index."""
    leaf_values: List[np.ndarray]          # one (num_polys,) vector per oracle
    paths: List[List[np.ndarray]]


@dataclass
class FriQueryStep:
    coset_values: np.ndarray               # (2^a, 2) ext values
    path: List[np.ndarray]


@dataclass
class FriQueryRound:
    index: int
    initial: FriInitialOpening
    steps: List[FriQueryStep]


@dataclass
class FriProof:
    commit_caps: List[np.ndarray]
    final_poly: List[ExtensionField]
    pow_witness: int
    query_rounds: List[FriQueryRound]


# -- proof-of-work grinding ------------------------------------------------------

def _pow_challenge_states(challenger: Challenger, nonces: np.ndarray) -> np.ndarray:
    """Batched duplex: what get_challenge would return after observing each
    nonce on a copy of ``challenger``."""
    base_inputs = list(challenger.input_buffer)
    state = np.tile(np.array(challenger.sponge_state, dtype=np.uint64),
                    (len(nonces), 1))
    for i, v in enumerate(base_inputs):
        state[:, i] = v
    state[:, len(base_inputs)] = nonces
    out = poseidon.permute_best(state)
    return out[:, 7]  # output_buffer.pop() returns state[rate-1]


def find_pow_witness(challenger: Challenger, pow_bits: int) -> int:
    """Find a nonce whose resulting challenge has >= pow_bits leading zeros.

    Expected work is 2^pow_bits tries; the cap at 2^(pow_bits+12) batches
    (~4096x the expectation) turns a misconfigured grind into a diagnostic
    instead of an unbounded loop.

    When a real accelerator is attached the grind runs as the device batch
    kernel instead: the standard-config grind is ~65k Poseidon permutes,
    ~0.9 s at the native host lib's ~95k permutes/s but ~0.1 s on the TPU —
    it dominates an otherwise-host prove of a tiny circuit (the recursion
    chain's init level).  Both sides scan nonces in increasing order and
    return the FIRST hit, so the witness (and transcript) is identical;
    PMT_POW_DEVICE=0 forces the host loop."""
    if os.environ.get("PMT_POW_DEVICE", "auto") != "0":
        try:
            from .device import accelerator_present
            if accelerator_present():
                from .device import _find_pow_witness_device
                return _find_pow_witness_device(challenger, pow_bits)
        except Exception as e:
            # the device grind is an optimisation, never a dependency: a
            # busy/held device or kernel failure falls back to the host
            # loop below, which finds the identical witness
            print(f"[fri] device PoW grind unavailable "
                  f"({type(e).__name__}: {e}); grinding on host", flush=True)
    batch = 1 << 16
    threshold = np.uint64(1 << (64 - pow_bits))
    start = 0
    limit = 1 << (pow_bits + 12)
    while start < max(limit, batch * 4):
        nonces = np.arange(start, start + batch, dtype=np.uint64)
        ch = _pow_challenge_states(challenger, nonces)
        hits = np.nonzero(ch < threshold)[0]
        if hits.size:
            return int(nonces[hits[0]])
        start += batch
    raise RuntimeError(
        f"proof-of-work grind exhausted {start} nonces without a hit "
        f"(pow_bits={pow_bits}) — grinding parameters are misconfigured")


def check_pow(challenger: Challenger, nonce: int, pow_bits: int) -> bool:
    challenger.observe_element(nonce)
    c = challenger.get_challenge()
    return c < (1 << (64 - pow_bits))


# -- query phase (shared between the numpy and device provers) ----------------------

def _gather_traced(idx, oracle_ldes, oracle_levels, layer_vals,
                   layer_levels, arities):
    """Traced body of the fully-jitted gather: every oracle row, tree path,
    layer coset and layer path flattened into ONE output vector.  Shapes are
    static; only the query indices are data."""
    import jax.numpy as jnp
    pieces = []

    def tree_paths(inner, rows):
        out = []
        sel = rows
        for level in inner:
            out.append(level[sel ^ 1])
            sel = sel // 2
        return jnp.concatenate(out, axis=0) if out \
            else jnp.zeros((0, 4), dtype=jnp.uint64)

    for lde, levels in zip(oracle_ldes, oracle_levels):
        pieces.append(lde[:, idx].T)
        pieces.append(tree_paths(levels, idx))
    rows = idx
    for vals, levels, a_bits in zip(layer_vals, layer_levels, arities):
        m_next = int(vals.shape[0]) >> a_bits
        rows = rows % m_next
        gidx = rows[:, None] + \
            (jnp.arange(1 << a_bits, dtype=jnp.int64) * m_next)[None, :]
        pieces.append(vals[gidx.reshape(-1)])
        pieces.append(tree_paths(levels, rows))
    return jnp.concatenate([p.reshape(-1).astype(jnp.uint64) for p in pieces])


@lru_cache(maxsize=1)
def _gather_jit():
    import jax
    return jax.jit(_gather_traced, static_argnames=("arities",))


def gather_query_rounds(indices, oracles, trees, layer_arities,
                        layer_values) -> List["FriQueryRound"]:
    """Open every oracle leaf row, oracle tree path, layer coset and layer
    tree path at the query indices.

    When everything is device-resident the whole gather runs as ONE jitted
    program with the indices as a traced input (one dispatch + one
    transfer; the eager per-level gathers cost ~0.8s of tunnel round trips
    per prove).  Otherwise device pieces are queued eagerly and fetched in
    one transfer; host-resident (numpy) arrays pass through untouched, so
    the numpy prover shares this implementation verbatim."""
    n_q = len(indices)
    idx_np = np.asarray([int(i) for i in indices], dtype=np.int64)

    all_device = all(
        field._xp(o.lde_values) is not np
        and all(field._xp(lv) is not np for lv in o.tree.levels)
        for o in oracles) and all(
        field._xp(v) is not np for v in layer_values) and all(
        all(field._xp(lv) is not np for lv in t.levels) for t in trees)
    if all_device and oracles:
        import jax.numpy as jnp
        flat = np.asarray(_gather_jit()(
            jnp.asarray(idx_np),
            [o.lde_values for o in oracles],
            [o.tree.levels[:-1] for o in oracles],
            list(layer_values),
            [t.levels[:-1] for t in trees],
            arities=tuple(layer_arities)))
        # mirror the traced piece order/shapes to slice the flat result
        shapes = []
        for o in oracles:
            shapes.append((n_q, int(o.lde_values.shape[0])))
            shapes.append(((len(o.tree.levels) - 1) * n_q, 4))
        for t, a_bits in zip(trees, layer_arities):
            shapes.append((n_q * (1 << a_bits), 2))
            shapes.append(((len(t.levels) - 1) * n_q, 4))
        fetched, off = [], 0
        for s in shapes:
            size = int(np.prod(s))
            fetched.append(flat[off:off + size].reshape(s))
            off += size
        return _assemble_query_rounds(indices, oracles, trees, layer_arities,
                                      fetched)

    # queue pieces in the canonical order _assemble_query_rounds expects:
    # per oracle (rows, paths), then per layer (cosets, paths)
    pieces = []

    def queue_tree_paths(tree, rows_np):
        """One (n_levels * n_q, 4) gather for a tree's sibling paths."""
        inner = tree.levels[:-1]
        if not inner:
            pieces.append(np.zeros((0, 4), dtype=np.uint64))
            return
        xp = field._xp(inner[0])
        sel = rows_np.copy()
        gathered = []
        for level in inner:
            s = sel ^ 1
            gathered.append(level[s] if xp is np else level[xp.asarray(s)])
            sel = sel // 2
        cat = np.concatenate if xp is np else xp.concatenate
        pieces.append(cat(gathered, axis=0))

    for oracle in oracles:
        leaves = oracle.tree.leaves
        if leaves is not None and field._xp(leaves) is np:
            # full leaf rows (includes zero-knowledge salt columns if any)
            pieces.append(leaves[idx_np])
        else:
            xp = field._xp(oracle.lde_values)
            sel = idx_np if xp is np else xp.asarray(idx_np)
            pieces.append(oracle.lde_values[:, sel].T)     # (n_q, num_polys)
        queue_tree_paths(oracle.tree, idx_np)

    idxs = idx_np
    for tree, a_bits, values in zip(trees, layer_arities, layer_values):
        m_next = int(values.shape[0]) >> a_bits
        rows = idxs % m_next
        gidx = rows[:, None] + \
            (np.arange(1 << a_bits, dtype=np.int64) * m_next)[None, :]
        xp = field._xp(values)
        sel = gidx.reshape(-1) if xp is np else xp.asarray(gidx.reshape(-1))
        pieces.append(values[sel])
        queue_tree_paths(tree, rows)
        idxs = rows

    # flush: ONE transfer covering every queued device piece
    fetched = [None] * len(pieces)
    dev = [(k, p) for k, p in enumerate(pieces) if field._xp(p) is not np]
    if dev:
        import jax.numpy as jnp
        flat = np.asarray(jnp.concatenate(
            [jnp.asarray(p).reshape(-1).astype(jnp.uint64) for _, p in dev]))
        off = 0
        for k, p in dev:
            size = int(np.prod(p.shape))
            fetched[k] = flat[off:off + size].reshape(p.shape)
            off += size
    for k, p in enumerate(pieces):
        if fetched[k] is None:
            fetched[k] = np.asarray(p)

    return _assemble_query_rounds(indices, oracles, trees, layer_arities,
                                  fetched)


def _assemble_query_rounds(indices, oracles, trees, layer_arities, fetched
                           ) -> List["FriQueryRound"]:
    """Build FriQueryRound objects from the canonical fetched-piece order:
    per oracle (rows, paths), then per layer (cosets, paths)."""
    n_q = len(indices)
    k = 0
    oracle_rows = []
    for o in oracles:
        rows_mat, paths_flat = fetched[k], fetched[k + 1]
        k += 2
        n_lv = len(o.tree.levels) - 1
        oracle_rows.append(
            (list(rows_mat),
             [[paths_flat[lv * n_q + q] for lv in range(n_lv)]
              for q in range(n_q)]))
    layer_cosets, layer_paths = [], []
    for t, a_bits in zip(trees, layer_arities):
        layer_cosets.append(fetched[k].reshape(n_q, 1 << a_bits, 2))
        paths_flat = fetched[k + 1]
        k += 2
        n_lv = len(t.levels) - 1
        layer_paths.append([[paths_flat[lv * n_q + q] for lv in range(n_lv)]
                            for q in range(n_q)])

    query_rounds = []
    for q, index in enumerate(indices):
        initial = FriInitialOpening(
            leaf_values=[oracle_rows[o][0][q] for o in range(len(oracles))],
            paths=[oracle_rows[o][1][q] for o in range(len(oracles))])
        steps = [FriQueryStep(coset_values=layer_cosets[lv][q],
                              path=layer_paths[lv][q])
                 for lv in range(len(trees))]
        query_rounds.append(FriQueryRound(index=index, initial=initial,
                                          steps=steps))
    return query_rounds


# -- prover -------------------------------------------------------------------------

def fri_prove(lde_ext_values: np.ndarray, oracles, challenger: Challenger,
              fri_config, degree_bits: int, shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR
              ) -> FriProof:
    """``lde_ext_values``: (M, 2) evaluations of the combined polynomial over
    the rate-extended coset; ``oracles``: committed PolynomialBatches opened
    at query indices."""
    m = lde_ext_values.shape[0]
    log_m = m.bit_length() - 1
    arities = fri_config.reduction_arity_bits(degree_bits)

    current = lde_ext_values
    cur_log = log_m
    cur_shift = shift
    trees: List[MerkleCommitment] = []
    layer_arities: List[int] = []
    caps: List[np.ndarray] = []
    layer_values: List[np.ndarray] = []

    for a_bits in arities:
        leaves = _group_coset_leaves(current, a_bits)
        tree = MerkleCommitment(leaves, min(fri_config.cap_height,
                                            int(np.log2(leaves.shape[0]))))
        trees.append(tree)
        layer_arities.append(a_bits)
        layer_values.append(current)
        caps.append(np.asarray(tree.cap))
        challenger.observe_cap(tree.cap)
        beta = challenger.get_extension_challenge()
        for t in range(a_bits):
            current = fold_binary(current, beta ** (1 << t), cur_log, cur_shift)
            cur_shift = cur_shift * cur_shift % P
            cur_log -= 1

    # final polynomial (degree < 2^final_bits by construction)
    c0 = nttmod.coset_intt(current[:, 0], shift=cur_shift)
    c1 = nttmod.coset_intt(current[:, 1], shift=cur_shift)
    final_len = min(len(c0), 1 << fri_config.final_poly_max_degree_bits)
    if not all(int(v) == 0 for v in c0[final_len:]) or \
            not all(int(v) == 0 for v in c1[final_len:]):
        raise RuntimeError("final poly degree too high")  # survives -O
    final_poly = [ExtensionField(int(a), int(b))
                  for a, b in zip(c0[:final_len], c1[:final_len])]
    for coeff in final_poly:
        challenger.observe_extension(coeff)

    # grinding
    pow_witness = find_pow_witness(challenger, fri_config.proof_of_work_bits)
    if not check_pow(challenger, pow_witness, fri_config.proof_of_work_bits):
        raise RuntimeError("proof-of-work grind failed")  # survives -O

    # queries — indices drawn first, then every oracle/tree/layer gathered in
    # one batched transfer (gather_query_rounds)
    n_q = fri_config.num_query_rounds
    indices = [challenger.get_challenge() % m for _ in range(n_q)]
    query_rounds = gather_query_rounds(indices, oracles, trees, layer_arities,
                                       layer_values)

    return FriProof(commit_caps=caps, final_poly=final_poly,
                    pow_witness=pow_witness, query_rounds=query_rounds)


# -- verifier --------------------------------------------------------------------------

def fri_verify(proof: FriProof, compute_initial_eval, oracle_caps,
               challenger: Challenger, fri_config, degree_bits: int,
               lde_bits: int, shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR) -> bool:
    """``compute_initial_eval(index, initial_opening) -> ExtensionField``
    recombines the oracle openings into F(x_index) (protocol-specific);
    ``oracle_caps``: caps to check initial openings against."""
    m = 1 << lde_bits
    arities = fri_config.reduction_arity_bits(degree_bits)

    betas = []
    for cap in proof.commit_caps:
        challenger.observe_cap(cap)
        betas.append(challenger.get_extension_challenge())
    if len(proof.commit_caps) != len(arities):
        return False
    challenger.observe_elements(
        v for c in proof.final_poly for v in c.to_basefield_array())
    if len(proof.final_poly) > (1 << fri_config.final_poly_max_degree_bits):
        return False
    if not check_pow(challenger, proof.pow_witness, fri_config.proof_of_work_bits):
        return False

    if len(proof.query_rounds) != fri_config.num_query_rounds:
        return False

    # ---- batched query phase: every check below is the exact vectorised
    # twin of the per-query scalar walk (same integer mod-p arithmetic,
    # same accept/reject conditions), evaluated for all n_q queries at
    # once — batched native sponge for the Merkle paths, (n_q, 2) numpy
    # extension arithmetic for the folds.  Malformed (ragged) proof
    # components surface as ValueError/IndexError, which the caller maps
    # to rejection, exactly like the scalar walk's out-of-range indexing.
    from .field_ext import ext_mul, ext_sub
    n_q = len(proof.query_rounds)
    indices = np.asarray([challenger.get_challenge() % m for _ in
                          range(n_q)], dtype=np.int64)
    if any(int(i) != qr.index for i, qr in zip(indices, proof.query_rounds)):
        return False

    # initial oracle openings, one batched verify per oracle tree
    for oi, cap in enumerate(oracle_caps):
        leaves = np.asarray([[int(v) for v in qr.initial.leaf_values[oi]]
                             for qr in proof.query_rounds], dtype=np.uint64)
        paths = [qr.initial.paths[oi] for qr in proof.query_rounds]
        if not MerkleCommitment.verify_batch(leaves, indices, paths, cap):
            return False
    values = compute_initial_eval(indices, proof.query_rounds)  # (n_q, 2)

    idx = indices.copy()
    cur_log = lde_bits
    cur_shift = shift
    for li, (a_bits, beta, tree_cap) in enumerate(
            zip(arities, betas, proof.commit_caps)):
        m_next = (1 << cur_log) >> a_bits
        rows = idx % m_next
        pos = idx // m_next
        coset = np.asarray([qr.steps[li].coset_values
                            for qr in proof.query_rounds], dtype=np.uint64)
        if coset.shape != (n_q, 1 << a_bits, 2):
            return False
        # the queried value must sit inside the opened coset
        if not np.array_equal(coset[np.arange(n_q), pos], values):
            return False
        if not MerkleCommitment.verify_batch(
                coset.reshape(n_q, -1), rows,
                [qr.steps[li].path for qr in proof.query_rounds], tree_cap):
            return False
        # fold each coset down with beta, beta^2, ...: vals[:, t] sits at
        # x_t = shift * omega^(row + t*m_next); binary fold pairs
        # (t, t + size/2) and squares the points.
        w = field.primitive_root_of_unity(cur_log)
        wm = pow(int(w), int(m_next), P)
        x0 = np.asarray([cur_shift * pow(w, int(r), P) % P for r in rows],
                        dtype=np.uint64)
        half_inv = np.uint64(field.h_inverse(2))
        cur_b = np.array([beta.a0, beta.a1], dtype=np.uint64)
        from .. import native as _native
        if _native.available():
            # whole binary fold in one native call (identical op order)
            values = _native.fold_coset(coset, x0, wm, cur_b, int(half_inv))
        else:
            vals = coset                               # (n_q, size, 2)
            xs = np.stack([field.mul(x0, np.uint64(pow(wm, t, P)))
                           for t in range(1 << a_bits)], axis=1)
            size = 1 << a_bits
            while size > 1:
                h = size // 2
                a_v, b_v = vals[:, :h], vals[:, h:size]
                e = ext_mul(field.add(a_v, b_v),
                            np.broadcast_to(
                                np.array([half_inv, 0], dtype=np.uint64),
                                a_v.shape))
                two_x_inv = field.inv_vec(field.mul_small(xs[:, :h], 2))
                o = ext_mul(ext_mul(ext_sub(a_v, b_v),
                                    np.broadcast_to(cur_b, a_v.shape)),
                            np.stack([two_x_inv, np.zeros_like(two_x_inv)],
                                     axis=-1))
                vals = field.add(e, o)
                xs = field.mul(xs[:, :h], xs[:, :h])
                size = h
                cur_b = ext_mul(cur_b[None, :], cur_b[None, :])[0]
            values = vals[:, 0]
        idx = rows
        for _ in range(a_bits):
            cur_shift = cur_shift * cur_shift % P
            cur_log -= 1

    # final polynomial evaluation at the surviving points (batched Horner)
    w = field.primitive_root_of_unity(cur_log)
    x = np.asarray([cur_shift * pow(w, int(i), P) % P for i in idx],
                   dtype=np.uint64)
    from .. import native as _native
    if _native.available():
        coeff_arr = np.asarray([(c.a0, c.a1) for c in proof.final_poly],
                               dtype=np.uint64).reshape(-1, 2)
        acc = _native.ext_horner(coeff_arr, x)
    else:
        x_ext = np.stack([x, np.zeros_like(x)], axis=-1)
        acc = np.zeros((n_q, 2), dtype=np.uint64)
        for coeff in reversed(proof.final_poly):
            acc = field.add(ext_mul(acc, x_ext),
                            np.broadcast_to(
                                np.array([coeff.a0, coeff.a1], dtype=np.uint64),
                                acc.shape))
    return bool(np.array_equal(acc, values))
