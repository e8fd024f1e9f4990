"""Per-layer recursive Merkle-proof verification (example2 parity).

The layer-per-proof chain from examples/merkle_proof_example2.rs:
* ``initial_proof_circuit``   (:15-44): proves one 2-to-1 hash, digest is
  the public input;
* ``recursive_step``          (:50-112): verifies the previous proof
  in-circuit, connects its public output to the next level's input hash,
  hashes with the next sibling (side fixed at build time);
* ``verify_merkle_proof_circuit_and_proof`` (:124-192): chains a full prove
  per tree level — log2(N) sequential full prover runs, the reference's most
  expensive flow (SURVEY.md §3.5).
"""

from typing import List, Tuple

from ..plonk.builder import CircuitBuilder, HashOutTarget
from ..plonk.circuit_data import CircuitData
from ..plonk.config import CircuitConfig
from ..plonk.witness import PartialWitness


def initial_proof_circuit(config: CircuitConfig = None
                          ) -> Tuple[CircuitData, List[HashOutTarget]]:
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())
    left = builder.add_virtual_hash()
    right = builder.add_virtual_hash()
    digest = builder.hash_or_noop(left.elements + right.elements)
    builder.register_public_inputs(digest.elements)
    return builder.build(), [left, right]


def recursive_step(previous_common, sibling_right_side: bool,
                   config: CircuitConfig = None):
    """Returns (circuit_data, prev_proof_target, prev_verifier_data_target,
    [sibling hash target])."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())

    input_hash = builder.add_virtual_hash()
    prev_proof_target = builder.add_virtual_proof_with_pis(previous_common)
    prev_proof_verifier_data = builder.add_virtual_verifier_data(
        previous_common.config.fri_config.cap_height)

    # connect the previous proof's public output to this level's input
    for e1, e2 in zip(input_hash.elements, prev_proof_target.public_inputs[0:4]):
        builder.connect(e1, e2)

    builder.verify_proof(prev_proof_target, prev_proof_verifier_data,
                         previous_common)

    targets: List[HashOutTarget] = []
    sibling = builder.add_virtual_hash()
    targets.append(sibling)
    if sibling_right_side:
        digest = builder.hash_or_noop(input_hash.elements + sibling.elements)
    else:
        digest = builder.hash_or_noop(sibling.elements + input_hash.elements)
    builder.register_public_inputs(digest.elements)

    return builder.build(), prev_proof_target, prev_proof_verifier_data, targets


def verify_merkle_proof_circuit_and_proof(leaf_index: int, leaf_value,
                                          merkle_proof, in_between_hashes,
                                          config: CircuitConfig = None):
    """Chain one full prove per tree level; returns (final circuit_data,
    final proof) — reference :124-192."""
    initial_data, initial_targets = initial_proof_circuit(config)
    pw = PartialWitness()
    current_leaf_index = leaf_index
    if current_leaf_index % 2 == 0:
        pw.set_hash_target(initial_targets[0], leaf_value)
        pw.set_hash_target(initial_targets[1], merkle_proof[0])
    else:
        pw.set_hash_target(initial_targets[0], merkle_proof[0])
        pw.set_hash_target(initial_targets[1], leaf_value)
    current_leaf_index //= 2
    for t, v in zip(initial_data.prover_only.public_inputs, in_between_hashes[0]):
        pw.set_target(t, int(v))

    prev_common = initial_data.common
    prev_proof = initial_data.prove(pw)
    prev_verifier_data = initial_data.verifier_only
    final_circuit = initial_data

    for i in range(1, len(merkle_proof)):
        current_pw = PartialWitness()
        siblings_right_side = current_leaf_index % 2 == 0
        next_data, prev_proof_target, v_data_target, new_targets = \
            recursive_step(prev_common, siblings_right_side, config)
        current_pw.set_hash_target(new_targets[0], merkle_proof[i])
        current_pw.set_proof_with_pis_target(prev_proof_target, prev_proof)
        current_pw.set_verifier_data_target(v_data_target, prev_verifier_data)
        for t, v in zip(next_data.prover_only.public_inputs, in_between_hashes[i]):
            current_pw.set_target(t, int(v))

        prev_common = next_data.common
        prev_proof = next_data.prove(current_pw)
        prev_verifier_data = next_data.verifier_only
        current_leaf_index //= 2
        final_circuit = next_data

    return final_circuit, prev_proof


# ---------------------------------------------------------------------------
# Shape-stable chain: THREE circuit shapes for a chain of ANY depth
# ---------------------------------------------------------------------------
#
# The reference chain (above) bakes the sibling side into every step and
# verifies a different-shaped inner circuit at every level, so each tree
# level is a brand-new circuit shape — no compiled-program reuse, and the
# device prover's per-shape compile cost is paid log2(N) times.
#
# The in-circuit verifier (plonk/recursion.py:verify_proof_circuit) depends
# only on the inner circuit's STRUCTURE: (config, degree_bits,
# num_public_inputs) — the circuit digest and constants/sigmas cap enter as
# witness.  So one "uniform" step circuit built against a synthetic common
# of its own degree D verifies ANY degree-D proof of that structure,
# including its own previous instance.  The chain becomes:
#
#   init (tiny)  →  step1 (degree D, verifies init)  →  uniform × (L-2)
#
# with D found as a fixpoint (pad the circuit to degree D; D is the
# smallest power of two that fits the verifier of a degree-D proof).  The
# sibling side is a runtime-muxed bool witness, not baked.
#
# TRUST MODEL / verifier-data binding.  Because the inner verifier data is
# pure witness, a bare uniform step would accept a valid proof of ANY
# degree-D circuit of the right shape — soundness would rest entirely on
# the final out-of-band check of the LAST level's verifier data.  To bind
# every level, each step exposes a second public output, a running
# VERIFIER-DATA CHAIN COMMITMENT:
#
#   C_1 = H( vdd(used at step 1) || 0 0 0 0 )          (step1, verifies init)
#   C_i = H( vdd(used at step i) || C_{i-1} )          (uniform, i >= 2)
#
# where vdd(·) = H(constants_sigmas_cap || circuit_digest) is the digest of
# the verifier data the step ACTUALLY verified against (computed in-circuit
# from the witnessed targets).  The final verifier recomputes the expected
# commitment from the three known circuits (init, step1, uniform) and the
# depth — verify_chain_binding — so a proof of a foreign circuit smuggled
# in at ANY level changes the final commitment and is rejected.  This is
# the binding VERDICT r1 #7 asked for; the reference's one-layer chain
# (recursive_step above) keeps parity semantics and is intentionally NOT
# changed.


def verifier_data_digest(verifier_only):
    """Host twin of the in-circuit vdd(): H(cap elements || circuit digest)."""
    import numpy as np
    from .. import poseidon
    elems = [int(v) for v in
             np.asarray(verifier_only.constants_sigmas_cap).reshape(-1)]
    elems += [int(v) for v in np.asarray(verifier_only.circuit_digest)]
    return poseidon.hash_no_pad_scalar(elems)


def _vdata_digest_circuit(builder, vdata):
    """In-circuit digest of the WITNESSED verifier data (same element order
    as verifier_data_digest)."""
    elems = []
    for h in vdata.constants_sigmas_cap:
        elems.extend(h.elements)
    elems.extend(vdata.circuit_digest.elements)
    return builder.hash_n_to_hash_no_pad(elems)


def _synthetic_common(config: CircuitConfig, degree_bits: int,
                      num_public_inputs: int = 4):
    """A CommonCircuitData carrying only the structural fields the
    in-circuit verifier consumes (see plonk/recursion.py:485 — selectors /
    gate constants are opened from the witness, never read at build)."""
    import numpy as np
    from .. import field
    from ..plonk.circuit_data import CommonCircuitData
    from ..plonk.gates import GATE_REGISTRY
    k_is = [pow(field.MULTIPLICATIVE_GROUP_GENERATOR, i, field.P)
            for i in range(config.num_routed_wires)]
    num_sel = len(GATE_REGISTRY)
    return CommonCircuitData(
        config=config, degree_bits=degree_bits,
        selectors=np.zeros((num_sel, 1), dtype=np.uint64),
        gate_constants=np.zeros((2, 1), dtype=np.uint64),
        k_is=k_is, num_public_inputs=num_public_inputs)


def chain_step_circuit(inner_common, config: CircuitConfig = None,
                       min_degree_bits: int = None, bind_vdata: bool = False):
    """One muxed-side chain step: verifies the previous proof, connects its
    public digest to this level's input, hashes with the sibling on the
    side selected by a runtime bool (1 = sibling on the right).

    With ``bind_vdata`` the step additionally exposes the verifier-data
    chain commitment C_i = H(vdd(witnessed vdata) || C_{i-1}) as public
    inputs 4..8 (C_{i-1} read from the inner proof's PIs 4..8, or zeros
    when the inner circuit predates the chain — the init circuit).

    Returns (circuit_data, prev_proof_target, prev_verifier_data_target,
    sibling_target, side_bit_target)."""
    builder = CircuitBuilder(config or CircuitConfig.standard_recursion_config())

    prev_proof_target = builder.add_virtual_proof_with_pis(inner_common)
    prev_vdata = builder.add_virtual_verifier_data(
        inner_common.config.fri_config.cap_height)
    input_hash = HashOutTarget(list(prev_proof_target.public_inputs[0:4]))
    builder.verify_proof(prev_proof_target, prev_vdata, inner_common)

    sibling = builder.add_virtual_hash()
    side_right = builder.add_virtual_bool_target_safe()
    left = [builder.select(side_right, input_hash.elements[i],
                           sibling.elements[i]) for i in range(4)]
    right = [builder.select(side_right, sibling.elements[i],
                            input_hash.elements[i]) for i in range(4)]
    digest = builder.hash_or_noop(left + right)
    builder.register_public_inputs(digest.elements)

    if bind_vdata:
        if inner_common.num_public_inputs >= 8:
            inner_chain = list(prev_proof_target.public_inputs[4:8])
        else:
            inner_chain = [builder.zero()] * 4
        vdd = _vdata_digest_circuit(builder, prev_vdata)
        chain = builder.hash_n_to_hash_no_pad(vdd.elements + inner_chain)
        builder.register_public_inputs(chain.elements)

    return (builder.build(min_degree_bits=min_degree_bits),
            prev_proof_target, prev_vdata, sibling, side_right)


_UNIFORM_CACHE = {}


def save_uniform_chain(bundle, cache_dir: str) -> None:
    """Checkpoint the three chain circuits + their witness-target
    structures (plain nested dataclasses of ints -> picklable).  Building
    the bundle costs minutes of host Python (the fixpoint search builds
    probe circuits); a serving/bench process loads it in seconds."""
    import os
    import pickle
    from ..serialization import save_circuit
    os.makedirs(cache_dir, exist_ok=True)
    for name in ("init", "step1", "uniform"):
        save_circuit(bundle[name][0], os.path.join(cache_dir, f"chain_{name}.npz"))
    with open(os.path.join(cache_dir, "chain_targets.pkl"), "wb") as f:
        pickle.dump({"init": bundle["init"][1],
                     "step1": list(bundle["step1"][1:]),
                     "uniform": list(bundle["uniform"][1:]),
                     "degree_bits": bundle["degree_bits"]}, f)
    with open(os.path.join(cache_dir, "CHAIN_COMPLETE"), "w") as f:
        f.write("ok\n")  # written LAST: a partial save never looks complete


def load_uniform_chain(cache_dir: str) -> dict:
    """Load a save_uniform_chain checkpoint (raises on absence/corruption).
    Same trust model as the program bundles: pickle, only load dirs you
    produced (plonk/device.py _bundle_wrap docstring)."""
    import os
    import pickle
    from ..serialization import load_circuit
    if not os.path.exists(os.path.join(cache_dir, "CHAIN_COMPLETE")):
        raise FileNotFoundError(cache_dir)
    with open(os.path.join(cache_dir, "chain_targets.pkl"), "rb") as f:
        t = pickle.load(f)
    out = {"degree_bits": t["degree_bits"]}
    for name in ("init", "step1", "uniform"):
        data = load_circuit(os.path.join(cache_dir, f"chain_{name}.npz"))
        out[name] = tuple([data] + list(t[name]) if name != "init"
                          else [data, t[name]])
    return out


def uniform_chain_circuits(config: CircuitConfig = None,
                           cache_dir: str = None):
    """Build (once per config) the three shapes of the shape-stable chain.

    Returns a dict with:
      init:    (circuit_data, [left_t, right_t])
      step1:   (circuit_data, proof_t, vdata_t, sibling_t, side_t)
      uniform: (circuit_data, proof_t, vdata_t, sibling_t, side_t)
      degree_bits: the fixpoint degree D

    ``cache_dir``: optional checkpoint directory — load the bundle from it
    when present (skipping the minutes-long builds), save into it after a
    fresh build otherwise.
    """
    config = config or CircuitConfig.standard_recursion_config()
    cached = _UNIFORM_CACHE.get(config)
    if cached is not None:
        return cached
    if cache_dir:
        try:
            bundle = load_uniform_chain(cache_dir)
            _UNIFORM_CACHE[config] = bundle
            return bundle
        except Exception:
            pass  # stale/absent checkpoint: build fresh below

    init_data, init_targets = initial_proof_circuit(config)

    # fixpoint: smallest D with natural_degree(verify degree-D proof) <= D.
    # The uniform step carries 8 public inputs (digest + chain commitment)
    # and verifies proofs of the same 8-PI shape.
    D = max(init_data.common.degree_bits + 1, 12)
    while True:
        probe = chain_step_circuit(
            _synthetic_common(config, D, num_public_inputs=8), config,
            min_degree_bits=D, bind_vdata=True)
        if probe[0].common.degree_bits == D:
            uniform = probe
            break
        D = probe[0].common.degree_bits

    step1 = chain_step_circuit(init_data.common, config, min_degree_bits=D,
                               bind_vdata=True)
    assert step1[0].common.degree_bits == D, \
        "step1 outgrew the uniform degree (verifying the tiny init circuit " \
        "must cost no more than verifying a degree-D proof)"

    bundle = {"init": (init_data, init_targets), "step1": step1,
              "uniform": uniform, "degree_bits": D}
    _UNIFORM_CACHE[config] = bundle
    if cache_dir:
        try:
            save_uniform_chain(bundle, cache_dir)
        except Exception:
            pass  # read-only cache dir: the in-process cache still works
    return bundle


def verify_merkle_proof_chain_uniform(leaf_index: int, leaf_value,
                                      merkle_proof, in_between_hashes,
                                      config: CircuitConfig = None,
                                      cache_dir: str = None):
    """Shape-stable twin of verify_merkle_proof_circuit_and_proof: same
    statement chain, but every level >= 2 reuses ONE compiled circuit (and
    level 1 one more), so an N-leaf chain pays 3 circuit shapes instead of
    log2(N).  Returns (final circuit_data, final proof)."""
    bundle = uniform_chain_circuits(config, cache_dir=cache_dir)
    init_data, init_targets = bundle["init"]

    pw = PartialWitness()
    current_leaf_index = leaf_index
    if current_leaf_index % 2 == 0:
        pw.set_hash_target(init_targets[0], leaf_value)
        pw.set_hash_target(init_targets[1], merkle_proof[0])
    else:
        pw.set_hash_target(init_targets[0], merkle_proof[0])
        pw.set_hash_target(init_targets[1], leaf_value)
    current_leaf_index //= 2
    for t, v in zip(init_data.prover_only.public_inputs, in_between_hashes[0]):
        pw.set_target(t, int(v))

    prev_data = init_data
    prev_proof = init_data.prove(pw)

    for i in range(1, len(merkle_proof)):
        data, proof_t, vdata_t, sibling_t, side_t = \
            bundle["step1"] if i == 1 else bundle["uniform"]
        current_pw = PartialWitness()
        current_pw.set_hash_target(sibling_t, merkle_proof[i])
        current_pw.set_bool_target(side_t, current_leaf_index % 2 == 0)
        current_pw.set_proof_with_pis_target(proof_t, prev_proof)
        current_pw.set_verifier_data_target(vdata_t, prev_data.verifier_only)
        for t, v in zip(data.prover_only.public_inputs, in_between_hashes[i]):
            current_pw.set_target(t, int(v))
        prev_proof = data.prove(current_pw)
        prev_data = data
        current_leaf_index //= 2

    if len(merkle_proof) > 1:
        verify_chain_binding(prev_proof, len(merkle_proof), config)
    return prev_data, prev_proof


def expected_chain_commitment(depth: int, config: CircuitConfig = None):
    """The verifier-data chain commitment an honest depth-``depth`` chain
    must expose (depth = number of merkle-proof levels, >= 2):
    C_1 = H(vdd(init) || 0), C_2 = H(vdd(step1) || C_1),
    C_i = H(vdd(uniform) || C_{i-1}) for i >= 3."""
    import numpy as np
    from .. import poseidon
    bundle = uniform_chain_circuits(config)
    vdd_init = verifier_data_digest(bundle["init"][0].verifier_only)
    vdd_step1 = verifier_data_digest(bundle["step1"][0].verifier_only)
    vdd_uniform = verifier_data_digest(bundle["uniform"][0].verifier_only)
    chain = np.zeros(4, dtype=np.uint64)
    for i in range(1, depth):
        vdd = vdd_init if i == 1 else (vdd_step1 if i == 2 else vdd_uniform)
        chain = poseidon.hash_no_pad_scalar(
            [int(v) for v in vdd] + [int(v) for v in chain])
    return chain


def verify_chain_binding(proof, depth: int, config: CircuitConfig = None):
    """Check the final proof's chain-commitment PIs (4..8) against the
    expected honest-chain value — the out-of-circuit half of the binding
    (the in-circuit half accumulates the witnessed verifier data).  Raises
    ValueError on mismatch (a foreign circuit was verified at some level)."""
    import numpy as np
    expected = expected_chain_commitment(depth, config)
    got = np.asarray([int(v) for v in proof.public_inputs[4:8]],
                     dtype=np.uint64)
    if not np.array_equal(got, expected):
        raise ValueError(
            "verifier-data chain commitment mismatch: the proof chain "
            "verified at least one circuit that is not the expected "
            "init/step1/uniform sequence")
