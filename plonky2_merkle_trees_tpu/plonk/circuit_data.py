"""Preprocessed circuit data: build, prove, verify entry points.

Mirrors the reference's plonky2 surface (SURVEY.md §2.2):
``CircuitData::{build, prove, verify}``, with ``prover_only.public_inputs``
exposing the registered public-input targets like the reference tests use
(e.g. mmr_plonky2_verifier.rs:143).
"""

from dataclasses import dataclass, field as dc_field
from typing import Dict, List, Tuple

import numpy as np

from .. import field, poseidon
from .config import CircuitConfig
from .gates import GATE_REGISTRY, GATE_INDEX, NoopGate
from .witness import WitnessStore

P = field.P
MIN_ROWS_BITS = 3


def compute_circuit_digest(cap: np.ndarray, degree_bits: int,
                           config: CircuitConfig) -> np.ndarray:
    """Digest binding the verifier to the circuit AND its proof-system
    parameters.

    plonky2 0.1.3 hashes only ``constants_sigmas_cap`` (+ degree); the FRI
    parameters live out-of-band in ``CommonCircuitData``.  We additionally
    bind rate/cap/PoW/query-round/challenge counts and the zero-knowledge
    flag so a checkpoint-loaded circuit (serialization.py round-trips the
    config unauthenticated) cannot be silently re-verified under weaker
    parameters (VERDICT r2 weak #5).  Documented in docs/protocol.md.
    """
    fc = config.fri_config
    return poseidon.hash_no_pad_scalar(
        [int(v) for v in np.asarray(cap).reshape(-1)]
        + [degree_bits, fc.rate_bits, fc.cap_height, fc.proof_of_work_bits,
           fc.num_query_rounds, config.num_challenges,
           int(config.zero_knowledge)])


@dataclass
class CommonCircuitData:
    config: CircuitConfig
    degree_bits: int                       # log2(num rows)
    selectors: np.ndarray                  # (num_selectors, N)
    gate_constants: np.ndarray             # (2, N)
    k_is: List[int]                        # routed-wire coset shifts
    num_public_inputs: int
    # zero-knowledge only: noop rows whose wires get fresh random values at
    # prove time (plonky2 0.1.3's blind_and_pad analog); empty when zk=false
    blinding_rows: List[int] = dc_field(default_factory=list)

    @property
    def degree(self) -> int:
        return 1 << self.degree_bits

    @property
    def lde_bits(self) -> int:
        return self.degree_bits + self.config.fri_config.rate_bits

    @property
    def lde_size(self) -> int:
        return 1 << self.lde_bits


@dataclass
class ProverOnlyCircuitData:
    constants_sigmas_batch: object         # PolynomialBatch
    sigmas: np.ndarray                     # (R, N) sigma tag tables
    generators: List
    public_inputs: List[int]               # targets (reference API parity)
    uf: object                             # union-find over targets/cells
    uf_find: object                        # O(1) root lookup (precomputed map)
    rows: List[Tuple[object, Tuple[int, int]]]
    # prove-time fast paths, precomputed once at build:
    wm_fill: List = dc_field(default_factory=list)   # [(root, col, row)] for the wire matrix
    wm_cells: set = dc_field(default_factory=set)    # cells covered by wm_fill
    vec_gen: object = None                           # vectorised-engine tables (dict) or None
    root_map: dict = dc_field(default_factory=dict)  # node -> copy-class root


@dataclass
class VerifierOnlyCircuitData:
    constants_sigmas_cap: np.ndarray
    circuit_digest: np.ndarray


class CircuitData:
    def __init__(self, common, prover_only, verifier_only):
        self.common = common
        self.prover_only = prover_only
        self.verifier_only = verifier_only

    def prove(self, partial_witness):
        if self.common.config.zero_knowledge:
            # salted oracles + blinding rows live on the host prover path;
            # the fused device programs commit unsalted leaves (the
            # reference never proves in zk — docs/protocol.md §10)
            from .prover import prove
            return prove(self, partial_witness)
        from .device import device_mode
        if device_mode(self.common):
            from .device import prove_device
            return prove_device(self, partial_witness)
        from .prover import prove
        return prove(self, partial_witness)

    def verify(self, proof_with_pis) -> None:
        from .verifier import verify
        if not verify(self, proof_with_pis):
            raise AssertionError("proof verification failed")


def _domain_tags(n: int, k_is: List[int]) -> np.ndarray:
    """tags[c, r] = k_c * omega^r — the extended-domain labels for sigma."""
    log_n = n.bit_length() - 1
    w = field.primitive_root_of_unity(log_n)
    omega_pows = np.empty(n, dtype=np.uint64)
    acc = 1
    for r in range(n):
        omega_pows[r] = acc
        acc = acc * w % P
    tags = np.empty((len(k_is), n), dtype=np.uint64)
    for c, k in enumerate(k_is):
        tags[c] = field.mul(omega_pows, np.uint64(k))
    return tags


def _build_vec_gen(builder, root_map, wm_fill, wm_cells, n, num_wires):
    """Build the vectorised witness-engine tables (prover._run_generators'
    fast path): every generator's operand nodes resolved to dense root ids,
    grouped by kind so each fixpoint pass is a handful of array ops plus one
    native batched Poseidon trace.  Returns None when any generator lacks a
    structured descriptor (falls back to the closure walk)."""
    from .gates import POSEIDON_TRACE_COLS
    descs = getattr(builder, "gen_descs", [])
    if len(descs) != len(builder.generators):
        return None

    root_id: Dict = {}

    def rid(node):
        root = root_map.get(node, node)
        i = root_id.get(root)
        if i is None:
            i = len(root_id)
            root_id[root] = i
        return i

    consts, arith, pos, eqs = [], [], [], []
    invs, ext_invs = [], []
    splits: Dict = {}
    for d in descs:
        if d[0] == "const":
            _, row, slot, value = d
            consts.append((rid(("c", row, slot)), value))
        elif d[0] == "arith":
            _, x, y, z, out, c0, c1 = d
            arith.append((rid(("t", x)), rid(("t", y)), rid(("t", z)),
                          rid(("t", out)), c0, c1))
        elif d[0] == "poseidon":
            _, row, inputs = d
            in_ids = [rid(("t", t)) for t in inputs]
            out_ids = [rid(("c", row, col)) for col in POSEIDON_TRACE_COLS]
            pos.append((in_ids, out_ids))
        elif d[0] == "eq":
            _, x, y, b, inv = d
            eqs.append((rid(("t", x)), rid(("t", y)), rid(("t", b)),
                        rid(("t", inv))))
        elif d[0] == "inv":
            _, t, out = d
            invs.append((rid(("t", t)), rid(("t", out))))
        elif d[0] == "ext_inv":
            _, a0, a1, i0, i1 = d
            ext_invs.append((rid(("t", a0)), rid(("t", a1)),
                             rid(("t", i0)), rid(("t", i1))))
        elif d[0] == "split":
            _, t, bits = d
            splits.setdefault(len(bits), []).append(
                (rid(("t", t)), tuple(rid(("t", b)) for b in bits)))
        else:
            return None

    # make sure every root referenced elsewhere has an id too
    for root, _, _ in wm_fill:
        i = root_id.get(root)
        if i is None:
            root_id[root] = len(root_id)
    for t in builder.public_inputs:
        rid(("t", t))

    vg = {"root_id": root_id}
    vg["const_ids"] = np.array([c[0] for c in consts], dtype=np.int64)
    vg["const_vals"] = np.array([c[1] for c in consts], dtype=np.uint64)
    vg["a_x"] = np.array([a[0] for a in arith], dtype=np.int64)
    vg["a_y"] = np.array([a[1] for a in arith], dtype=np.int64)
    vg["a_z"] = np.array([a[2] for a in arith], dtype=np.int64)
    vg["a_o"] = np.array([a[3] for a in arith], dtype=np.int64)
    vg["a_c0"] = np.array([a[4] for a in arith], dtype=np.uint64)
    vg["a_c1"] = np.array([a[5] for a in arith], dtype=np.uint64)
    vg["p_in"] = np.array([p[0] for p in pos], dtype=np.int64).reshape(-1, 12)
    vg["p_out"] = np.array([p[1] for p in pos], dtype=np.int64).reshape(
        -1, len(POSEIDON_TRACE_COLS))
    vg["eqs"] = eqs
    vg["inv_t"] = np.array([i[0] for i in invs], dtype=np.int64)
    vg["inv_o"] = np.array([i[1] for i in invs], dtype=np.int64)
    vg["ei_a"] = np.array([[e[0], e[1]] for e in ext_invs],
                          dtype=np.int64).reshape(-1, 2)
    vg["ei_o"] = np.array([[e[2], e[3]] for e in ext_invs],
                          dtype=np.int64).reshape(-1, 2)
    vg["splits"] = {
        nb: (np.array([s[0] for s in group], dtype=np.int64),
             np.array([s[1] for s in group], dtype=np.int64).reshape(-1, nb))
        for nb, group in splits.items()
    }

    # vectorised wire-matrix fill: wm_fill plus descriptor-written cells that
    # have no entry in the union-find (poseidon trace cells are written, not
    # placed)
    ids, cols, rows_ = [], [], []
    for root, col, row in wm_fill:
        ids.append(root_id[root])
        cols.append(col)
        rows_.append(row)
    for d in descs:
        if d[0] == "poseidon":
            _, row, _inputs = d
            if row < n:
                for col in POSEIDON_TRACE_COLS:
                    node = ("c", row, col)
                    if col < num_wires and node not in wm_cells:
                        ids.append(root_id[root_map.get(node, node)])
                        cols.append(col)
                        rows_.append(row)
    vg["wm_ids"] = np.array(ids, dtype=np.int64)
    vg["wm_cols"] = np.array(cols, dtype=np.int64)
    vg["wm_rows"] = np.array(rows_, dtype=np.int64)
    vg["prog"] = _build_witness_program(vg)
    return vg


def _build_witness_program(vg):
    """Serialize the vec_gen tables into the native witness VM's instruction
    stream + consumer CSR (see gp_run_witness in native/goldilocks_poseidon
    .cpp).  One instruction per generator; the VM schedules them at prove
    time with Kahn's algorithm seeded from the user-set cells, so the whole
    witness materialises in a single native call instead of one vectorised
    pass per dependency level (~870 passes for the recursion outer circuit)."""
    from .field_ext import W as EXT_W
    n_roots = len(vg["root_id"])
    ops_list, args_list, lens_list = [], [], []
    edge_instr, edge_root = [], []
    base = 0

    def add_group(op, mat, in_cols):
        nonlocal base
        mat = np.ascontiguousarray(mat, dtype=np.uint64)
        n, k = mat.shape
        if n == 0:
            return
        ops_list.append(np.full(n, op, dtype=np.int32))
        args_list.append(mat.reshape(-1))
        lens_list.append(np.full(n, k, dtype=np.int64))
        if in_cols:
            edge_instr.append(np.repeat(
                np.arange(base, base + n, dtype=np.int64), len(in_cols)))
            edge_root.append(mat[:, in_cols].astype(np.int64).reshape(-1))
        base += n

    if vg["const_ids"].shape[0]:
        add_group(0, np.stack([vg["const_ids"].astype(np.uint64),
                               vg["const_vals"]], axis=1), [])
    if vg["a_x"].shape[0]:
        add_group(1, np.stack([vg["a_x"].astype(np.uint64),
                               vg["a_y"].astype(np.uint64),
                               vg["a_z"].astype(np.uint64),
                               vg["a_o"].astype(np.uint64),
                               vg["a_c0"], vg["a_c1"]], axis=1), [0, 1, 2])
    if vg["p_in"].shape[0]:
        add_group(2, np.concatenate([vg["p_in"].astype(np.uint64),
                                     vg["p_out"].astype(np.uint64)], axis=1),
                  list(range(12)))
    if vg["inv_t"].shape[0]:
        add_group(3, np.stack([vg["inv_t"].astype(np.uint64),
                               vg["inv_o"].astype(np.uint64)], axis=1), [0])
    if vg["ei_a"].shape[0]:
        n_ei = vg["ei_a"].shape[0]
        add_group(4, np.concatenate(
            [vg["ei_a"].astype(np.uint64), vg["ei_o"].astype(np.uint64),
             np.full((n_ei, 1), EXT_W, dtype=np.uint64)], axis=1), [0, 1])
    for nb, (s_t, s_bits) in vg["splits"].items():
        n_s = s_t.shape[0]
        add_group(5, np.concatenate(
            [s_t.astype(np.uint64)[:, None],
             np.full((n_s, 1), nb, dtype=np.uint64),
             s_bits.astype(np.uint64)], axis=1), [0])
    if vg["eqs"]:
        add_group(6, np.array(vg["eqs"], dtype=np.uint64), [0, 1])

    if not ops_list:
        return None
    ops = np.concatenate(ops_list)
    args = np.concatenate(args_list).view(np.int64)
    lens = np.concatenate(lens_list)
    arg_off = np.zeros(ops.shape[0] + 1, dtype=np.int64)
    np.cumsum(lens, out=arg_off[1:])
    n_instr = int(ops.shape[0])

    # consumer CSR over DISTINCT (root, instr) pairs — the VM's unmet
    # counters count distinct input roots per instruction.
    if edge_instr:
        instr = np.concatenate(edge_instr)
        root = np.concatenate(edge_root)
        key = np.unique(root * np.int64(n_instr) + instr)
        root_s = key // n_instr
        instr_s = key % n_instr
    else:
        root_s = np.zeros(0, dtype=np.int64)
        instr_s = np.zeros(0, dtype=np.int64)
    counts = np.bincount(root_s, minlength=n_roots)
    cons_off = np.zeros(n_roots + 1, dtype=np.int64)
    np.cumsum(counts, out=cons_off[1:])
    return {"ops": ops, "args": args, "arg_off": arg_off,
            "cons_off": cons_off, "cons_idx": instr_s.astype(np.int32)}


def build_circuit_data(builder, min_degree_bits: int = None) -> CircuitData:
    from .commitment import PolynomialBatch

    config = builder.config
    num_rows_used = len(builder.rows)
    # zero-knowledge: reserve noop rows that the prover fills with fresh
    # random wire values (each cell is a singleton copy class, so sigma =
    # its own tag and the permutation argument is unaffected).  4 rows give
    # every wire polynomial 4 random degrees of freedom — enough to hide
    # the openings at zeta (wires: 1 point; Z: zeta and g*zeta).
    blinding_rows: List[int] = []
    if config.zero_knowledge:
        NUM_BLINDING_ROWS = 4
        blinding_rows = list(range(num_rows_used,
                                   num_rows_used + NUM_BLINDING_ROWS))
        num_rows_used += NUM_BLINDING_ROWS
    degree_bits = max(MIN_ROWS_BITS, (num_rows_used - 1).bit_length())
    if min_degree_bits is not None:
        # pad with noop rows to a target degree — lets circuits of different
        # contents share one SHAPE (the uniform recursion chain needs the
        # inner and outer degrees to agree at a fixpoint)
        degree_bits = max(degree_bits, min_degree_bits)
    n = 1 << degree_bits
    rows = list(builder.rows) + [(NoopGate(), (0, 0))] * (n - len(builder.rows))

    num_selectors = len(GATE_REGISTRY)
    selectors = np.zeros((num_selectors, n), dtype=np.uint64)
    gate_constants = np.zeros((2, n), dtype=np.uint64)
    for r, (gate, consts) in enumerate(rows):
        selectors[GATE_INDEX[gate.id], r] = 1
        gate_constants[0, r] = consts[0]
        gate_constants[1, r] = consts[1]

    r_wires = config.num_routed_wires
    k_is = [pow(field.MULTIPLICATIVE_GROUP_GENERATOR, i, P) for i in range(r_wires)]
    tags = _domain_tags(n, k_is)

    # sigma: collect copy classes over routed cells; unconstrained cells map
    # to themselves, each class forms one cycle.
    classes: Dict = {}
    uf = builder.uf
    for node in list(uf.parent.keys()):
        if node[0] == "c":
            _, row, col = node
            if col < r_wires and row < n:
                classes.setdefault(uf.find(node), []).append((row, col))

    sigmas = tags.T.copy()                 # (N, R): default sigma = own tag
    for members in classes.values():
        if len(members) < 2:
            continue
        for i, (row, col) in enumerate(members):
            nrow, ncol = members[(i + 1) % len(members)]
            sigmas[row, col] = tags[ncol, nrow]
    sigmas = np.ascontiguousarray(sigmas.T)  # (R, N)

    # preprocessed oracle: selectors + constants + sigmas.  On accelerator
    # platforms this is by far the most expensive build step (LDE + Merkle
    # tree over (num_polys, 8N)); run it as the device prover's commit stage
    # instead of host numpy (measured: 122s -> ~1s for a degree-2^15 circuit).
    pre_values = np.concatenate([selectors, gate_constants, sigmas], axis=0)
    from types import SimpleNamespace
    from .device import device_mode
    if device_mode(SimpleNamespace(degree_bits=degree_bits)):
        from .device import DeviceBatch, _stage_batch
        import jax.numpy as jnp
        rate_bits = config.fri_config.rate_bits
        cap_height = config.fri_config.cap_height
        coeffs, lde, levels = _stage_batch(rate_bits, cap_height)(
            jnp.asarray(pre_values))
        pre_batch = DeviceBatch(coeffs, lde, levels,
                                min(cap_height, degree_bits + rate_bits))
        pre_batch.values = pre_values
    else:
        pre_batch = PolynomialBatch.from_values(
            pre_values, config.fri_config.rate_bits, config.fri_config.cap_height)

    cap = np.asarray(pre_batch.cap)
    circuit_digest = compute_circuit_digest(cap, degree_bits, config)

    common = CommonCircuitData(
        config=config, degree_bits=degree_bits, selectors=selectors,
        gate_constants=gate_constants, k_is=k_is,
        num_public_inputs=len(builder.public_inputs),
        blinding_rows=blinding_rows)

    # Precompute prove-time fast paths: the union-find is final now, so (a)
    # resolve every node's root ONCE (WitnessStore then does a single dict
    # lookup instead of a path walk per access — the walks dominated witness
    # generation), and (b) freeze the wire-matrix fill list.
    root_map = {node: uf.find(node) for node in uf.parent}
    uf_find = lambda node: root_map.get(node, node)  # noqa: E731
    num_wires = config.num_wires
    wm_fill = []
    wm_cells = set()
    # NB: union-find roots are not keys of ``parent`` (find() never inserts
    # them), so walk root_map's values as well as its keys — a class whose
    # root is a cell must still fill that cell.
    for node, root in root_map.items():
        if node[0] == "c":
            _, row, col = node
            if row < n and col < num_wires:
                wm_fill.append((root, col, row))
                wm_cells.add(node)
    for root in set(root_map.values()):
        if root[0] == "c" and root not in wm_cells:
            _, row, col = root
            if row < n and col < num_wires:
                wm_fill.append((root, col, row))
                wm_cells.add(root)

    vec_gen = _build_vec_gen(builder, root_map, wm_fill, wm_cells, n, num_wires)

    prover_only = ProverOnlyCircuitData(
        constants_sigmas_batch=pre_batch, sigmas=sigmas,
        generators=list(builder.generators),
        public_inputs=list(builder.public_inputs),
        uf=uf, uf_find=uf_find, rows=rows,
        wm_fill=wm_fill, wm_cells=wm_cells,
        vec_gen=vec_gen, root_map=root_map)
    verifier_only = VerifierOnlyCircuitData(
        constants_sigmas_cap=cap, circuit_digest=circuit_digest)
    return CircuitData(common, prover_only, verifier_only)
