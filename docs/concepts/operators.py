# # Operators
#
# Operator utilities: embedding gates in larger spaces, lifting local
# operators, direct sums, string constructors (reference:
# docs/literate/concepts/operators.jl).
#
# Run it:  python docs/concepts/operators.py   (CPU, < 1 min)

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np               # noqa: E402
import piccolax as px            # noqa: E402

# ## EmbeddedOperator
#
# Place a gate defined on a computational SUBSPACE into a larger
# Hilbert space, remembering which indices are computational and which
# are leakage:

op = px.EmbeddedOperator(px.GATES["X"], [0, 1], levels=3)
assert op.levels == 3
assert tuple(op.subspace) == (0, 1)
assert list(op.leakage_indices()) == [2]

# The embedded matrix carries X on the (|0>,|1>) block and ZEROS
# elsewhere — fidelity is evaluated on the subspace only (Pedersen
# subspace fidelity), so the leakage block is irrelevant to the goal:

M = np.asarray(op.operator)
np.testing.assert_allclose(M[:2, :2], px.GATES["X"], atol=1e-14)
np.testing.assert_allclose(M[2, :], 0.0, atol=1e-14)

# `unembed` recovers the subspace block:

np.testing.assert_allclose(np.asarray(op.unembed()), px.GATES["X"],
                           atol=1e-14)

# Multi-qubit embedding via subsystem levels (two 3-level transmons,
# gate on the 2x2 computational corner):

op2 = px.EmbeddedOperator(px.GATES["CX"], subsystem_levels=[3, 3])
assert op2.levels == 9
assert len(op2.subspace) == 4

# `get_subspace_indices` / `get_leakage_indices` are the standalone
# index helpers:

sub = px.quantum.get_subspace_indices([[0, 1], [0, 1]], [3, 3])
assert list(op2.subspace) == list(sub)

# ## embed / unembed free functions

X_emb = px.quantum.embed(px.GATES["X"], [0, 1], 4)
assert X_emb.shape == (4, 4)
np.testing.assert_allclose(
    np.asarray(px.quantum.unembed(X_emb, [0, 1])), px.GATES["X"],
    atol=1e-14)

# ## lift_operator
#
# Promote a local operator to the joint space of several subsystems:

a = px.quantum.annihilate(2)
levels = [2, 2, 2]
a2 = px.quantum.lift_operator(a, 1, levels)
assert a2.shape == (8, 8)
expected = np.kron(np.kron(np.eye(2), a), np.eye(2))
np.testing.assert_allclose(a2, expected, atol=1e-14)

# ## direct_sum

AB = px.quantum.direct_sum(px.PAULIS["X"], px.PAULIS["Z"])
assert AB.shape == (4, 4)
np.testing.assert_allclose(AB[:2, :2], px.PAULIS["X"])
np.testing.assert_allclose(AB[2:, 2:], px.PAULIS["Z"])

# ## String constructors

XZ = px.quantum.operator_from_string("XZ")
np.testing.assert_allclose(XZ, np.kron(px.PAULIS["X"], px.PAULIS["Z"]),
                           atol=1e-14)

ket_ge = px.quantum.ket_from_string("ge", [2, 2])
e0 = np.zeros(4)
e0[1] = 1.0                       # |g>|e> = index 0*2 + 1 in row-major
np.testing.assert_allclose(ket_ge, e0, atol=1e-14)

# ## Creation/annihilation/number operators

n_op = px.quantum.operators.number_op(3)
np.testing.assert_allclose(n_op, np.diag([0.0, 1.0, 2.0]), atol=1e-14)
cr = px.quantum.create(3)
np.testing.assert_allclose(cr @ np.array([1.0, 0, 0]),
                           np.array([0, 1.0, 0]), atol=1e-14)
print("operators complete.")
