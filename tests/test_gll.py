"""GLL nodes/weights/derivative-matrix unit tests (analytic properties)."""

import numpy as np
import pytest

from fustpu.elements import gll
from fustpu.elements.hex import HexElement, hex8_tabulate, tabulate_3d_basis


@pytest.mark.parametrize("n", [2, 3, 4, 5, 6, 7, 8, 11])
def test_gll_points_weights(n):
    x, w = gll.gll_points_weights(n)
    assert x[0] == -1.0 and x[-1] == 1.0
    assert np.all(np.diff(x) > 0)
    assert np.allclose(x, -x[::-1], atol=1e-14)   # symmetry
    assert np.isclose(w.sum(), 2.0, atol=1e-13)
    # exactness: GLL with n points integrates degree 2n-3 exactly
    for deg in range(0, 2 * n - 2):
        exact = (1.0 - (-1.0) ** (deg + 1)) / (deg + 1)
        assert np.isclose(np.sum(w * x**deg), exact, atol=1e-12), deg


def test_known_gll_values():
    # P=4 (n=5): nodes +-1, +-sqrt(3/7), 0; weights 1/10, 49/90, 32/45
    x, w = gll.gll_points_weights(5)
    assert np.allclose(x, [-1, -np.sqrt(3 / 7), 0, np.sqrt(3 / 7), 1],
                       atol=1e-14)
    assert np.allclose(w, [1 / 10, 49 / 90, 32 / 45, 49 / 90, 1 / 10],
                       atol=1e-14)


@pytest.mark.parametrize("n", [3, 5, 7])
def test_derivative_matrix(n):
    x = gll.gll_nodes_unit(n)
    D = gll.derivative_matrix(n)
    # exact differentiation of polynomials up to degree n-1
    for deg in range(n):
        f = x**deg
        df = deg * x ** max(deg - 1, 0) if deg > 0 else np.zeros_like(x)
        assert np.allclose(D @ f, df, atol=1e-11)


def test_lagrange_tabulate_interpolation():
    n = 6
    nodes = gll.gll_nodes_unit(n)
    pts = np.linspace(0.0, 1.0, 17)
    vals, ders = gll.lagrange_tabulate(nodes, pts)
    # partition of unity and exact reproduction of degree n-1 polynomials
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-12)
    coef = np.arange(1, n + 1, dtype=float)
    f = np.polyval(coef, nodes)
    fp = np.polyval(coef, pts)
    dfp = np.polyval(np.polyder(coef), pts)
    assert np.allclose(vals @ f, fp, atol=1e-10)
    assert np.allclose(ders @ f, dfp, atol=1e-8)
    # coincident points reproduce kronecker rows
    v2, _ = gll.lagrange_tabulate(nodes, nodes)
    assert np.allclose(v2, np.eye(n), atol=1e-12)


def test_hex8_partition_of_unity_and_gradients():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (20, 3))
    vals, grads = hex8_tabulate(pts)
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-14)
    assert np.allclose(grads.sum(axis=1), 0.0, atol=1e-14)
    # finite-difference check
    eps = 1e-6
    for d in range(3):
        shift = np.zeros(3)
        shift[d] = eps
        vp, _ = hex8_tabulate(pts + shift)
        vm, _ = hex8_tabulate(pts - shift)
        assert np.allclose((vp - vm) / (2 * eps), grads[:, :, d], atol=1e-8)


def test_tabulate_3d_basis():
    elem = HexElement(3)
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (10, 3))
    vals, grads = tabulate_3d_basis(elem, pts)
    assert np.allclose(vals.sum(axis=1), 1.0, atol=1e-12)
    # collocation: identity at the quadrature (=node) lattice
    v2, _ = tabulate_3d_basis(elem, elem.quad_points)
    assert np.allclose(v2, np.eye(elem.ndofs), atol=1e-12)
    eps = 1e-6
    for d in range(3):
        shift = np.zeros(3)
        shift[d] = eps
        vp, _ = tabulate_3d_basis(elem, pts + shift)
        vm, _ = tabulate_3d_basis(elem, pts - shift)
        assert np.allclose((vp - vm) / (2 * eps), grads[:, :, d], atol=1e-6)


def test_facet_dofs_tensor_structure():
    elem = HexElement(4)
    n = elem.n
    # facet x-: dofs (0, j, k)
    assert np.array_equal(elem.facet_dofs(0),
                          (np.arange(n)[:, None] * n
                           + np.arange(n)[None, :]).ravel())
    # every facet has n^2 distinct dofs
    for f in range(6):
        assert len(set(elem.facet_dofs(f).tolist())) == n * n
