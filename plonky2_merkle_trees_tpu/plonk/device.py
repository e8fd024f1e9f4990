"""Device-resident prover: the same protocol as prover.prove, with every
bulk stage compiled to ONE XLA program and all polynomial data living on the
accelerator between stages.

Motivation (measured on the target host): the machine driving the TPU has a
single weak CPU core (~13k vectorised-numpy Poseidon permutes/s) while the
chip does ~34M/s; the tunnel costs ~30 ms per synchronous round trip and
~50 MB/s per transfer.  So the prover must (a) keep the wire/LDE matrices on
device, (b) cross the host boundary only where the Fiat-Shamir transcript
needs scalar values (caps, openings, challenges), and (c) batch every FRI
query gather.  Host keeps: witness generation, the challenger (native C++
Poseidon), index math.

Stage graph (H = host sync point for the challenger):

  wires ──upload──> [intt→LDE→hash→tree] ──cap──H──betas,gammas
      ratios = [f/g products]            ──ratio_all──H (prefix product)
      z ──upload──> [partials→intt→LDE→tree] ──cap──H──alphas
      [eval_combined → /Z_H → intt]      →  quotient batch ──cap──H──zeta
      [eval at zeta / zeta·omega]        ──openings──H──fri_alpha
      [combine F(x)]  → FRI: per layer [fold→group→hash→tree] ──cap──H──beta
      PoW grind on device ──nonce──H ; batched query gathers ──openings──H

Every jitted stage is cached per (shapes, static params) by jax.jit itself;
the package-level persistent compilation cache makes the first process pay
the XLA compile at most once per circuit shape.

Protocol parity: produces byte-identical transcripts to prover.prove (tested
on the CPU mesh with PMT_PROVER_DEVICE=1 against the numpy path).
"""

import os
from functools import lru_cache
from typing import List

import numpy as np

from .. import field, poseidon
from ..poseidon_constants import RATE, WIDTH
from .challenger import Challenger
from .commitment import MerkleCommitment, PolynomialBatch
from .field_ext import ExtensionField, ext_mul, W
from .fri import FriProof, check_pow, coset_points, gather_query_rounds
from .proof import OpeningSet, Proof, ProofWithPublicInputs
from .vanishing import CHUNK, eval_combined
from .algebra import BatchAlgebra
from . import ntt as nttmod
from .circuit_data import _domain_tags
from . import prover as host_prover

P = field.P


AUTO_DEVICE_MIN_DEGREE_BITS = 10


def device_mode(common=None) -> bool:
    """Device prover on? PMT_PROVER_DEVICE=1 forces, =0 disables.  In auto
    mode: on iff an accelerator platform is attached AND the circuit is big
    enough to amortise the per-shape XLA compiles (degree >= 2^10; a tiny
    circuit proves in ~1.6s on the numpy+native path, while a cold stage
    compile through the TPU tunnel costs minutes).  Never on the CPU test
    mesh."""
    mode = os.environ.get("PMT_PROVER_DEVICE", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    bits = getattr(common, "degree_bits", None)
    if bits is not None and bits < AUTO_DEVICE_MIN_DEGREE_BITS:
        return False
    import jax
    try:
        return jax.devices()[0].platform in ("tpu", "axon", "gpu", "cuda")
    except Exception:
        return False


def _jnp():
    import jax.numpy as jnp
    return jnp


# ---------------------------------------------------------------------------
# Jitted stages (module-level cache; jax.jit re-specialises per shape)
# ---------------------------------------------------------------------------

def _permute_device(state):
    """Poseidon permutation inside a traced stage — Pallas for large batches
    on a TPU backend (single source of truth: ops.tree_kernels)."""
    from ..ops.tree_kernels import _permute_traced
    return _permute_traced(state)


def _hash_rows_device(matrix):
    """hash_or_noop over rows of (n, m) — commitment.hash_rows with the
    device permutation."""
    jnp = _jnp()
    n, m = int(matrix.shape[0]), int(matrix.shape[1])
    if m <= 4:
        out = jnp.zeros((n, 4), dtype=jnp.uint64)
        return out.at[:, :m].set(matrix)
    state = jnp.zeros((n, WIDTH), dtype=jnp.uint64)
    for start in range(0, m, RATE):
        chunk = matrix[:, start:start + RATE]
        state = state.at[:, :int(chunk.shape[1])].set(chunk)
        state = _permute_device(state)
    return state[:, :4]


def _merkle_levels(leaves_matrix, cap_height: int):
    """hash_or_noop each row, then pairwise-reduce to a 2^cap_height cap.
    Returns the digest levels (leaf level first, cap last)."""
    level = _hash_rows_device(leaves_matrix)
    levels = [level]
    jnp = _jnp()
    while level.shape[0] > (1 << cap_height):
        pairs = level.reshape(-1, 2, 4)
        state = jnp.concatenate(
            [pairs[:, 0, :], pairs[:, 1, :],
             jnp.zeros((pairs.shape[0], 4), dtype=jnp.uint64)], axis=-1)
        level = _permute_device(state)[:, :4]
        levels.append(level)
    return levels


@lru_cache(maxsize=None)
def _stage_batch(rate_bits: int, cap_height: int):
    import jax

    def fn(values):
        coeffs = nttmod.intt(values)
        lde = nttmod.coset_lde(coeffs, rate_bits)
        levels = _merkle_levels(lde.T, cap_height)
        return coeffs, lde, levels

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_wires(rate_bits: int, cap_height: int, num_wires: int, n: int):
    """Wire matrix scatter + commit in one program.  The host uploads the
    dense witness root vector (a few MB) instead of the materialised
    (num_wires, N) matrix (tens of MB through the ~50 MB/s tunnel); the
    build-time (root id, col, row) fill list lives on device."""
    import jax
    jnp = _jnp()

    def fn(V, K, ids, cols, rows):
        vals = jnp.where(K[ids], V[ids], jnp.uint64(0))
        wires = jnp.zeros((num_wires, n), dtype=jnp.uint64)
        wires = wires.at[cols, rows].set(vals)
        coeffs = nttmod.intt(wires)
        lde = nttmod.coset_lde(coeffs, rate_bits)
        levels = _merkle_levels(lde.T, cap_height)
        return wires, coeffs, lde, levels

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_ratios(num_chunks: int):
    import jax

    def fn(routed, sigmas, tags, betas, gammas):
        # f = routed + beta*tags + gamma ; g = routed + beta*sigmas + gamma
        # ratios[c, j] = prod_i f[c, chunk j] / prod_i g[c, chunk j]
        jnp = _jnp()
        nc = betas.shape[0]
        out = []
        for c in range(nc):
            beta, gamma = betas[c], gammas[c]
            f = field.add(routed, field.add(field.mul(tags, beta), gamma))
            g = field.add(routed, field.add(field.mul(sigmas, beta), gamma))
            ratios_c = []
            for j in range(num_chunks):
                fj, gj = f[CHUNK * j], g[CHUNK * j]
                for i in range(CHUNK * j + 1, CHUNK * (j + 1)):
                    fj = field.mul(fj, f[i])
                    gj = field.mul(gj, g[i])
                ratios_c.append(field.mul(fj, field.inv_vec(gj)))
            out.append(jnp.stack(ratios_c))
        ratios = jnp.stack(out)                      # (nc, chunks, n)
        ratio_all = ratios[:, 0]
        for j in range(1, num_chunks):
            ratio_all = field.mul(ratio_all, ratios[:, j])
        return ratios, ratio_all

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_zsp(num_chunks: int, rate_bits: int, cap_height: int):
    """Permutation-argument rows AND their commitment in one program (no
    challenger interaction between them — one executable load instead of
    two)."""
    import jax

    def fn(z_rows, ratios):
        # rows: [z_c for all c] then, per c, partials z_c*prod_{k<=j} ratios
        jnp = _jnp()
        nc = z_rows.shape[0]
        rows = [z_rows[c] for c in range(nc)]
        for c in range(nc):
            prod = z_rows[c]
            for j in range(num_chunks - 1):
                prod = field.mul(prod, ratios[c, j])
                rows.append(prod)
        zsp_values = jnp.stack(rows)
        coeffs = nttmod.intt(zsp_values)
        lde = nttmod.coset_lde(coeffs, rate_bits)
        levels = _merkle_levels(lde.T, cap_height)
        return coeffs, lde, levels

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_quotient(num_sel: int, r_wires: int, num_wires: int, nc: int,
                    k_is: tuple, degree_bits: int, rate_bits: int,
                    cap_height: int):
    """Quotient evaluation, intt, AND the quotient commitment in one
    program (no challenger interaction between them)."""
    import jax
    num_chunks = r_wires // CHUNK
    n = 1 << degree_bits
    m = n << rate_bits
    rate = 1 << rate_bits

    def fn(pre_lde, wires_lde, zsp_lde, xs, betas, gammas, alphas, pi_hash):
        jnp = _jnp()
        alg = BatchAlgebra(jnp, m)
        sel_rows = [pre_lde[i] for i in range(num_sel)]
        const_rows = [pre_lde[num_sel + i] for i in range(2)]
        sigma_rows = [pre_lde[num_sel + 2 + i] for i in range(r_wires)]
        wire_rows = [wires_lde[i] for i in range(num_wires)]
        zs_rows = [zsp_lde[c] for c in range(nc)]
        zs_next_rows = [jnp.roll(zr, -rate) for zr in zs_rows]
        partials_lde = {
            c: [zsp_lde[nc + c * (num_chunks - 1) + j]
                for j in range(num_chunks - 1)]
            for c in range(nc)
        }
        pi_hash_alg = [jnp.broadcast_to(pi_hash[i], (m,)) for i in range(4)]
        zh = field.sub(field.exp_vec(xs, n), np.uint64(1))
        l0 = field.mul(zh, field.inv_vec(
            field.mul_small(field.sub(xs, np.uint64(1)), n % P)))
        combined = eval_combined(
            alg, r_wires, list(k_is), xs, wire_rows, sel_rows, const_rows,
            sigma_rows, zs_rows, zs_next_rows, partials_lde,
            [betas[c] for c in range(nc)], [gammas[c] for c in range(nc)],
            [alphas[c] for c in range(nc)], pi_hash_alg, l0)
        zh_inv = field.inv_vec(zh)
        chunks = []
        for c in range(nc):
            t_coeffs = nttmod.coset_intt(field.mul(combined[c], zh_inv))
            for i in range(m // n):
                chunks.append(t_coeffs[i * n:(i + 1) * n])
        q_coeffs = jnp.stack(chunks)
        lde = nttmod.coset_lde(q_coeffs, rate_bits)
        levels = _merkle_levels(lde.T, cap_height)
        return q_coeffs, lde, levels

    return jax.jit(fn)


def _ext_powers(zeta, n: int):
    """(2,) extension scalar -> (n, 2) powers table by doubling (log n ext
    multiplies, each a full-width vectorised op)."""
    jnp = _jnp()
    powers = jnp.asarray(np.array([[1, 0]], dtype=np.uint64))
    cur = zeta
    while powers.shape[0] < n:
        k = min(powers.shape[0], n - powers.shape[0])
        nxt = ext_mul(powers[:k], jnp.broadcast_to(cur, (k, 2)))
        powers = jnp.concatenate([powers, nxt], axis=0)
        cur_b = jnp.broadcast_to(cur, (1, 2))
        cur = ext_mul(cur_b, cur_b)[0]
    return powers


def _ext_dot(coeffs, powers):
    """(k, n) base coeffs x (n, 2) ext powers -> (k, 2) evaluations, summed
    with a log-depth pairwise fold (stays canonical at every step)."""
    jnp = _jnp()
    res = []
    for comp in range(2):
        prods = field.mul(coeffs, powers[None, :, comp])
        while prods.shape[1] > 1:
            half = prods.shape[1] // 2
            head = field.add(prods[:, :half], prods[:, half:2 * half])
            if prods.shape[1] % 2:
                head = jnp.concatenate([head, prods[:, 2 * half:]], axis=1)
            prods = head
        res.append(prods[:, 0])
    return jnp.stack(res, axis=-1)


@lru_cache(maxsize=None)
def _stage_openings(n: int):
    import jax

    def fn(cs_coeffs, wires_coeffs, zsp_coeffs, q_coeffs, zs_head, zeta,
           zeta_next):
        powers = _ext_powers(zeta, n)
        powers_next = _ext_powers(zeta_next, n)
        # only the Z rows (not the partial products) are opened at zeta*omega
        return (_ext_dot(cs_coeffs, powers), _ext_dot(wires_coeffs, powers),
                _ext_dot(zsp_coeffs, powers), _ext_dot(q_coeffs, powers),
                _ext_dot(zs_head, powers_next))

    return jax.jit(fn)


def _ext_const_sub_dev(base_rows, y):
    """(m,) base values minus a (2,) ext value -> (m, 2)."""
    jnp = _jnp()
    return jnp.stack([field.sub(base_rows, y[0]),
                      jnp.broadcast_to(field.neg(y[1]), base_rows.shape)],
                     axis=-1)


def _ext_inv_vec_dev(a):
    a0, a1 = a[..., 0], a[..., 1]
    norm = field.sub(field.mul(a0, a0), field.mul_small(field.mul(a1, a1), W))
    inv_n = field.inv_vec(norm)
    jnp = _jnp()
    return jnp.stack([field.mul(a0, inv_n),
                      field.mul(field.neg(a1), inv_n)], axis=-1)


@lru_cache(maxsize=None)
def _stage_combine(num_all: int, nc: int):
    import jax

    def fn(all_rows, zsp_head, ys1, ys_next, fri_alpha, zeta, zeta_next, xs):
        jnp = _jnp()
        m = all_rows.shape[1]
        alpha_b = jnp.broadcast_to(fri_alpha, (m, 2))

        def combine(rows, ys):
            acc = jnp.zeros((m, 2), dtype=jnp.uint64)
            for j in range(rows.shape[0] - 1, -1, -1):
                acc = ext_mul(acc, alpha_b)
                acc = field.add(acc, _ext_const_sub_dev(rows[j], ys[j]))
            return acc

        r1 = combine(all_rows, ys1)
        f_vals = ext_mul(r1, _ext_inv_vec_dev(_ext_const_sub_dev(xs, zeta)))
        r2 = combine(zsp_head, ys_next)
        # shift = fri_alpha ** num_all
        shift = jnp.asarray(np.array([1, 0], dtype=np.uint64))
        base = fri_alpha
        e = num_all
        while e:
            if e & 1:
                shift = ext_mul(shift[None, :], base[None, :])[0]
            e >>= 1
            if e:
                base = ext_mul(base[None, :], base[None, :])[0]
        term2 = ext_mul(r2, _ext_inv_vec_dev(_ext_const_sub_dev(xs, zeta_next)))
        return field.add(f_vals, ext_mul(jnp.broadcast_to(shift, (m, 2)), term2))

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_fri_commit(a_bits: int, cap_height: int):
    import jax

    def fn(current):
        m = current.shape[0]
        a = 1 << a_bits
        leaves = current.reshape(a, m // a, 2).transpose(1, 0, 2).reshape(m // a, a * 2)
        return leaves, _merkle_levels(leaves, cap_height)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _stage_fri_fold(a_bits: int, log_m: int, shift: int):
    import jax

    def fn(current, beta):
        nxt = current
        b = beta
        cur_log, cur_shift = log_m, shift
        for _ in range(a_bits):
            nxt = _fold_binary_dev(nxt, b, cur_log, cur_shift)
            b_b = b[None, :]
            b = ext_mul(b_b, b_b)[0]
            cur_shift = cur_shift * cur_shift % P
            cur_log -= 1
        return nxt

    return jax.jit(fn)


def _fold_binary_dev(values, beta, log_m: int, shift: int):
    """fold_binary with a dynamic (2,) beta (fri.fold_binary takes a host
    scalar; same math)."""
    jnp = _jnp()
    m = values.shape[0]
    half = m // 2
    a, b = values[:half], values[half:]
    s = field.add(a, b)
    d = field.sub(a, b)
    half_inv = np.uint64(field.h_inverse(2))
    pts = coset_points(log_m, shift)[:half]
    inv_2x = field.inv_vec(field.mul_small(jnp.asarray(pts), 2))
    term1 = jnp.stack([field.mul(s[:, 0], half_inv),
                       field.mul(s[:, 1], half_inv)], axis=-1)
    d_scaled = jnp.stack([field.mul(d[:, 0], inv_2x),
                          field.mul(d[:, 1], inv_2x)], axis=-1)
    term2 = ext_mul(d_scaled, jnp.broadcast_to(beta, (half, 2)))
    return field.add(term1, term2)


_POW_BATCH = 1 << 17


@lru_cache(maxsize=None)
def _stage_pow():
    import jax

    def fn(template, nonce_lane, start, threshold):
        jnp = _jnp()
        nonces = start + jnp.arange(_POW_BATCH, dtype=jnp.uint64)
        states = jnp.broadcast_to(template, (_POW_BATCH, WIDTH))
        states = states.at[:, nonce_lane].set(nonces)
        out = _permute_device(states)[:, RATE - 1]
        hits = out < threshold
        return jnp.any(hits), jnp.argmax(hits)

    return jax.jit(fn, static_argnames=("nonce_lane",))


def _find_pow_witness_device(challenger: Challenger, pow_bits: int) -> int:
    template = np.array(challenger.sponge_state, dtype=np.uint64)
    base_inputs = list(challenger.input_buffer)
    for i, v in enumerate(base_inputs):
        template[i] = v
    lane = len(base_inputs)
    threshold = np.uint64(1 << (64 - pow_bits))
    stage = _stage_pow()
    start = 0
    while True:
        found, idx = stage(_jnp().asarray(template), nonce_lane=lane,
                           start=np.uint64(start), threshold=threshold)
        if bool(found):
            return start + int(idx)
        start += _POW_BATCH


# ---------------------------------------------------------------------------
# Device-resident commitment wrapper
# ---------------------------------------------------------------------------

class DeviceBatch:
    """PolynomialBatch interface over device-resident arrays."""

    def __init__(self, coeffs, lde_values, levels, cap_height: int):
        self.coeffs = coeffs
        self.lde_values = lde_values
        self.tree = MerkleCommitment.from_levels(levels, cap_height)
        self._cap_np = None

    @property
    def cap(self) -> np.ndarray:
        if self._cap_np is None:
            self._cap_np = np.asarray(self.tree.cap)
        return self._cap_np

    def open_lde_rows(self, indices):
        return PolynomialBatch.open_lde_rows(self, indices)

    def eval_at_ext(self, zeta):
        """Host-side evaluation — lets the numpy prover consume a
        device-built oracle (e.g. a circuit built in device mode, proved
        with PMT_PROVER_DEVICE=0)."""
        from .commitment import eval_coeffs_at_ext
        return eval_coeffs_at_ext(np.asarray(self.coeffs), zeta)


def _upload_batch(batch, cache_attr: str = "_device"):
    """Host PolynomialBatch -> DeviceBatch (cached on the object). The tree
    levels stay host-side (already materialised at build time; open_many on
    numpy levels is cheap).  Already-device batches pass through."""
    if isinstance(batch, DeviceBatch):
        return batch
    dev = getattr(batch, cache_attr, None)
    if dev is None:
        jnp = _jnp()
        dev = DeviceBatch.__new__(DeviceBatch)
        dev.coeffs = jnp.asarray(batch.coeffs)
        dev.lde_values = jnp.asarray(batch.lde_values)
        dev.tree = batch.tree
        dev._cap_np = np.asarray(batch.tree.cap)
        object.__setattr__(batch, cache_attr, dev)
    return dev


# ---------------------------------------------------------------------------
# The orchestrator
# ---------------------------------------------------------------------------

def prove_device(circuit_data, pw) -> ProofWithPublicInputs:
    """Protocol-identical twin of prover.prove with device-resident stages
    (see module docstring for the stage/sync graph)."""
    import jax
    jnp = _jnp()

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
    rate_bits = fri_cfg.rate_bits
    cap_height = fri_cfg.cap_height

    # 1-2. witness (host) + public inputs
    w = host_prover._run_generators(circuit_data, pw)
    pi_values = []
    for t in po.public_inputs:
        v = w.get_target(t)
        if v is None:
            raise RuntimeError(f"public input target {t} was never set")
        pi_values.append(v)
    pi_hash = poseidon.hash_no_pad_scalar(pi_values) if pi_values \
        else np.zeros(4, dtype=np.uint64)

    # 3. commit wires on device.  For the vectorised witness engine the
    # wire matrix is scattered ON DEVICE from the dense root vector (a few
    # MB uploaded instead of the (num_wires, N) matrix — tens of MB through
    # the ~50 MB/s tunnel).  Side-dict cells (floating roots never
    # referenced at build time) would be missed by the scatter; fall back to
    # the host fill in that rare case.
    from .witness import VectorWitness
    use_scatter = isinstance(w, VectorWitness) and not any(
        isinstance(root, tuple) and root[0] == "c" for root in w._side)
    if use_scatter:
        vg = po.vec_gen
        dev_wm = getattr(po, "_device_wm", None)
        if dev_wm is None:
            dev_wm = (jnp.asarray(vg["wm_ids"].astype(np.int32)),
                      jnp.asarray(vg["wm_cols"].astype(np.int32)),
                      jnp.asarray(vg["wm_rows"].astype(np.int32)))
            po._device_wm = dev_wm
        wires_dev, w_coeffs, w_lde, w_levels = _stage_wires(
            rate_bits, cap_height, config.num_wires, n)(
                jnp.asarray(w.V), jnp.asarray(w.K), *dev_wm)
    else:
        wires = host_prover._wire_matrix(circuit_data, w)
        wires_dev = jnp.asarray(wires)
        w_coeffs, w_lde, w_levels = _stage_batch(rate_bits, cap_height)(wires_dev)
    wires_batch = DeviceBatch(w_coeffs, w_lde, w_levels, cap_height)

    ch = Challenger()
    ch.observe_hash(vo.circuit_digest)
    ch.observe_hash(pi_hash)
    ch.observe_cap(wires_batch.cap)
    betas = ch.get_n_challenges(nc)
    gammas = ch.get_n_challenges(nc)

    # 4. permutation argument
    dev_cache = getattr(po, "_device_tables", None)
    if dev_cache is None:
        dev_cache = {
            "tags": jnp.asarray(_domain_tags(n, common.k_is)),
            "sigmas": jnp.asarray(po.sigmas),
            "xs": jnp.asarray(coset_points(common.lde_bits,
                                           field.MULTIPLICATIVE_GROUP_GENERATOR)),
        }
        po._device_tables = dev_cache
    routed = wires_dev[:r_wires]
    ratios, ratio_all = _stage_ratios(num_chunks)(
        routed, dev_cache["sigmas"], dev_cache["tags"],
        jnp.asarray(np.array(betas, dtype=np.uint64)),
        jnp.asarray(np.array(gammas, dtype=np.uint64)))
    ratio_all_np = np.asarray(ratio_all)
    z_rows = np.empty((nc, n), dtype=np.uint64)
    for c in range(nc):
        acc = 1
        for r in range(n):
            z_rows[c, r] = acc
            acc = acc * int(ratio_all_np[c, r]) % P
        assert acc == 1, "permutation product does not close"
    z_coeffs, z_lde, z_levels = _stage_zsp(num_chunks, rate_bits, cap_height)(
        jnp.asarray(z_rows), ratios)
    zsp_batch = DeviceBatch(z_coeffs, z_lde, z_levels, cap_height)
    ch.observe_cap(zsp_batch.cap)
    alphas = ch.get_n_challenges(nc)

    # 5. quotient
    cs_dev = _upload_batch(po.constants_sigmas_batch)
    num_sel = common.selectors.shape[0]
    q_coeffs, q_lde, q_levels = _stage_quotient(
        num_sel, r_wires, config.num_wires, nc, tuple(common.k_is),
        common.degree_bits, rate_bits, cap_height)(
            cs_dev.lde_values, w_lde, z_lde, dev_cache["xs"],
            jnp.asarray(np.array(betas, dtype=np.uint64)),
            jnp.asarray(np.array(gammas, dtype=np.uint64)),
            jnp.asarray(np.array(alphas, dtype=np.uint64)),
            jnp.asarray(pi_hash))
    q_batch = DeviceBatch(q_coeffs, q_lde, q_levels, cap_height)
    ch.observe_cap(q_batch.cap)
    zeta = ch.get_extension_challenge()

    # 6. openings
    omega = field.primitive_root_of_unity(common.degree_bits)
    zeta_next = zeta * ExtensionField(omega)
    zeta_arr = jnp.asarray(np.array([zeta.a0, zeta.a1], dtype=np.uint64))
    zeta_next_arr = jnp.asarray(np.array([zeta_next.a0, zeta_next.a1],
                                         dtype=np.uint64))
    cs_ev, w_ev, zsp_ev, q_ev, zsp_next_ev = _stage_openings(n)(
        cs_dev.coeffs, w_coeffs, z_coeffs, q_coeffs, z_coeffs[:nc],
        zeta_arr, zeta_next_arr)

    def to_ext_list(arr, count=None):
        host = np.asarray(arr)
        if count is not None:
            host = host[:count]
        return [ExtensionField(int(a), int(b)) for a, b in host]

    zsp_evals = to_ext_list(zsp_ev)
    openings = OpeningSet(
        constants_sigmas=to_ext_list(cs_ev),
        wires=to_ext_list(w_ev),
        zs=zsp_evals[:nc],
        partials=zsp_evals[nc:],
        quotient=to_ext_list(q_ev),
        zs_next=to_ext_list(zsp_next_ev),
    )
    for e in openings.flat():
        ch.observe_extension(e)

    # 7. FRI
    fri_alpha = ch.get_extension_challenge()
    oracles = [cs_dev, wires_batch, zsp_batch, q_batch]
    all_rows = jnp.concatenate([o.lde_values for o in oracles], axis=0)
    ys1 = (openings.constants_sigmas + openings.wires + openings.zs
           + openings.partials + openings.quotient)
    ys1_arr = jnp.asarray(np.array([[y.a0, y.a1] for y in ys1], dtype=np.uint64))
    ys_next_arr = jnp.asarray(np.array([[y.a0, y.a1] for y in openings.zs_next],
                                       dtype=np.uint64))
    alpha_arr = jnp.asarray(np.array([fri_alpha.a0, fri_alpha.a1],
                                     dtype=np.uint64))
    f_vals = _stage_combine(int(all_rows.shape[0]), nc)(
        all_rows, z_lde[:nc], ys1_arr, ys_next_arr, alpha_arr,
        zeta_arr, zeta_next_arr, dev_cache["xs"])

    fri_proof = _fri_prove_device(f_vals, oracles, ch, fri_cfg,
                                  common.degree_bits)

    proof = Proof(wires_cap=wires_batch.cap,
                  zs_partial_cap=zsp_batch.cap,
                  quotient_cap=q_batch.cap,
                  openings=openings, fri=fri_proof)
    return ProofWithPublicInputs(proof=proof, public_inputs=pi_values)


def _fri_prove_device(f_vals, oracles, challenger: Challenger, fri_config,
                      degree_bits: int,
                      shift: int = field.MULTIPLICATIVE_GROUP_GENERATOR) -> FriProof:
    """fri.fri_prove with device folds/commits and batched query gathers."""
    jnp = _jnp()
    m = int(f_vals.shape[0])
    log_m = m.bit_length() - 1
    arities = fri_config.reduction_arity_bits(degree_bits)

    current = f_vals
    cur_log, cur_shift = log_m, shift
    trees: List[MerkleCommitment] = []
    layer_arities: List[int] = []
    caps: List[np.ndarray] = []
    layer_values = []

    for a_bits in arities:
        eff_cap = min(fri_config.cap_height, cur_log - a_bits)
        layer_values.append(current)
        _, levels = _stage_fri_commit(a_bits, eff_cap)(current)
        tree = MerkleCommitment.from_levels(levels, eff_cap)
        trees.append(tree)
        layer_arities.append(a_bits)
        cap_np = np.asarray(tree.cap)
        caps.append(cap_np)
        challenger.observe_cap(cap_np)
        beta = challenger.get_extension_challenge()
        beta_arr = jnp.asarray(np.array([beta.a0, beta.a1], dtype=np.uint64))
        current = _stage_fri_fold(a_bits, cur_log, cur_shift)(current, beta_arr)
        for _ in range(a_bits):
            cur_shift = cur_shift * cur_shift % P
            cur_log -= 1

    final_vals = np.asarray(current)
    c0 = nttmod.coset_intt(final_vals[:, 0], shift=cur_shift)
    c1 = nttmod.coset_intt(final_vals[:, 1], shift=cur_shift)
    final_len = min(len(c0), 1 << fri_config.final_poly_max_degree_bits)
    assert all(int(v) == 0 for v in c0[final_len:]), "final poly degree too high"
    assert all(int(v) == 0 for v in c1[final_len:]), "final poly degree too high"
    final_poly = [ExtensionField(int(a), int(b))
                  for a, b in zip(c0[:final_len], c1[:final_len])]
    for coeff in final_poly:
        challenger.observe_extension(coeff)

    pow_witness = _find_pow_witness_device(challenger,
                                           fri_config.proof_of_work_bits)
    assert check_pow(challenger, pow_witness, fri_config.proof_of_work_bits)

    # queries: shared single-transfer gather (fri.gather_query_rounds)
    n_q = fri_config.num_query_rounds
    indices = [challenger.get_challenge() % m for _ in range(n_q)]
    query_rounds = gather_query_rounds(indices, oracles, trees, layer_arities,
                                       layer_values)

    return FriProof(commit_caps=caps, final_poly=final_poly,
                    pow_witness=pow_witness, query_rounds=query_rounds)
