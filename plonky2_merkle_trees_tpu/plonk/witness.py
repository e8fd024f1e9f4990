"""Witness containers and generation.

``PartialWitness`` mirrors the reference's plonky2 surface
(set_target / set_hash_target / set_bool_target, SURVEY.md §2.2): values are
keyed by copy-class root, and conflicting assignments raise — parity with
plonky2's "set twice with different values" panic (documented in the
reference at examples/pol.rs:60-66).

Full witness materialisation: the builder records an ordered list of
generators (one per gate row / arithmetic op / custom gadget); they are run
to a fixpoint (the circuits are feed-forward, so this converges in a couple
of passes) and the (num_wires x num_rows) matrix is then filled from the
copy classes.
"""

from .. import field


class WitnessConflict(Exception):
    """A target was set twice with different values (plonky2 panic parity)."""


class PartialWitness:
    """User-facing initial assignments, keyed by target id."""

    def __init__(self):
        self.values = {}

    def set_target(self, target: int, value: int) -> None:
        value = int(value) % field.P
        old = self.values.get(target)
        if old is not None and old != value:
            raise WitnessConflict(
                f"target {target} was set twice with different values: {old} != {value}")
        self.values[target] = value

    def set_hash_target(self, hash_target, digest) -> None:
        for t, v in zip(hash_target.elements, digest):
            self.set_target(t, int(v))

    def set_bool_target(self, bool_target, value: bool) -> None:
        self.set_target(bool_target.target, 1 if value else 0)

    def set_extension_target(self, ext_target, value) -> None:
        self.set_target(ext_target[0], value.a0)
        self.set_target(ext_target[1], value.a1)

    def set_proof_with_pis_target(self, proof_target, proof_with_pis) -> None:
        from .recursion import set_proof_with_pis_target
        set_proof_with_pis_target(self, proof_target, proof_with_pis)

    def set_verifier_data_target(self, vdata_target, verifier_only) -> None:
        from .recursion import set_verifier_data_target
        set_verifier_data_target(self, vdata_target, verifier_only)


class VectorWitness:
    """Dense witness store for the vectorised generator engine: values live
    in a numpy array indexed by build-time root id (witness generation and
    the wire-matrix fill then run as array ops instead of per-cell python).
    Nodes whose roots were never referenced at build time (floating virtual
    targets) fall back to a side dict.

    ``target_ids`` (optional) is a dense target -> root id array (-1 for
    unmapped targets); circuits loaded from a checkpoint carry only this
    compact map instead of the build-time union-find dictionaries."""

    __slots__ = ("V", "K", "_root_id", "_root_map", "_side", "_tid")

    def __init__(self, n_roots: int, root_id: dict, root_map: dict,
                 target_ids=None):
        import numpy as np
        self.V = np.zeros(n_roots, dtype=np.uint64)
        self.K = np.zeros(n_roots, dtype=bool)
        self._root_id = root_id
        self._root_map = root_map
        self._side = {}
        self._tid = target_ids

    def _resolve(self, node):
        if self._tid is not None and node[0] == "t":
            t = node[1]
            if t < self._tid.shape[0]:
                i = int(self._tid[t])
                if i >= 0:
                    return i, node
            return None, node
        root = self._root_map.get(node, node)
        return self._root_id.get(root), root

    def get_node(self, node):
        i, root = self._resolve(node)
        if i is None:
            return self._side.get(root)
        return int(self.V[i]) if self.K[i] else None

    def set_node(self, node, value: int):
        value = int(value) % field.P
        i, root = self._resolve(node)
        if i is None:
            old = self._side.get(root)
            if old is not None and old != value:
                raise WitnessConflict(
                    f"witness cell {node} set twice with different values: "
                    f"{old} != {value}")
            self._side[root] = value
        else:
            if self.K[i] and int(self.V[i]) != value:
                raise WitnessConflict(
                    f"witness cell {node} set twice with different values: "
                    f"{int(self.V[i])} != {value}")
            self.V[i] = value
            self.K[i] = True

    def get_target(self, t: int):
        return self.get_node(("t", t))

    def set_target(self, t: int, value: int):
        self.set_node(("t", t), value)

    def get_wire(self, row: int, col: int):
        return self.get_node(("c", row, col))

    def set_wire(self, row: int, col: int, value: int):
        self.set_node(("c", row, col), value)


class WitnessStore:
    """Copy-class-rooted value store used during generation."""

    def __init__(self, find):
        self._find = find
        self._values = {}

    def get_node(self, node):
        return self._values.get(self._find(node))

    def set_node(self, node, value: int):
        root = self._find(node)
        value = int(value) % field.P
        old = self._values.get(root)
        if old is not None and old != value:
            raise WitnessConflict(
                f"witness cell {node} set twice with different values: {old} != {value}")
        self._values[root] = value

    def get_target(self, t: int):
        return self.get_node(("t", t))

    def set_target(self, t: int, value: int):
        self.set_node(("t", t), value)

    def get_wire(self, row: int, col: int):
        return self.get_node(("c", row, col))

    def set_wire(self, row: int, col: int, value: int):
        self.set_node(("c", row, col), value)
