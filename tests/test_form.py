"""Host-tier ``Form`` (metadata-carrying ndarray) and the ``supervillain_tpu.lattice``
reference-compatible namespace.

Mirrors the reference's Form semantics (/root/reference/supervillain/lattice/
compact.py:665-897): same-degree elementwise ufuncs re-wrap, mixed-degree and
reductions fall back to plain arrays, component views write back, interlaced
round-trips are exact, and face/coface sums match the device-tier operators.
"""

import numpy as np
import pytest

import supervillain_tpu as sv
from supervillain_tpu.lattice import Form, d, delta, laplacian, star, wedge
from supervillain_tpu.ops import calculus


@pytest.fixture(params=[(2, 4), (3, 3)], ids=lambda dn: f'D{dn[0]}N{dn[1]}')
def lattice(request):
    D, N = request.param
    return sv.Lattice(D, N)


def random_form(lattice, p, rng):
    return lattice.form(p, rng.standard_normal(lattice.form_shape(p)))


def test_factory_and_metadata(lattice):
    for p in range(lattice.D + 1):
        f = lattice.form(p)
        assert isinstance(f, Form)
        assert f.degree == p and f.lattice is lattice
        assert f.shape == Form.spatial_shape(degree=p, lattice=lattice)
        assert not f.any()


def test_wrap_existing_data(lattice):
    rng = np.random.default_rng(0)
    data = rng.standard_normal(lattice.form_shape(1))
    f = lattice.form(1, data)
    assert np.array_equal(np.asarray(f), data)
    with pytest.raises(ValueError):
        lattice.form(2, data) if lattice.form_shape(2) != lattice.form_shape(1) \
            else pytest.skip('degenerate C(D,1)==C(D,2)')


def test_same_degree_ufuncs_rewrap(lattice):
    rng = np.random.default_rng(1)
    a, b = (random_form(lattice, 1, rng) for _ in range(2))
    for result in (a + b, a * b, -a, np.abs(a), a ** 2, np.isclose(a, b), a == b):
        assert isinstance(result, Form)
        assert result.degree == 1 and result.lattice is lattice
    # scalars broadcast without losing metadata
    assert (2.0 * a).degree == 1


def test_mixed_degree_and_reductions_unwrap(lattice):
    rng = np.random.default_rng(2)
    a = random_form(lattice, 0, rng)
    b = random_form(lattice, 1, rng)
    if a.shape == b.shape:
        mixed = np.asarray(a) + b  # same shape only when C(D,0)==C(D,1); skip semantics
    else:
        pytest.skip('shapes differ; mixed-degree arithmetic is shape-invalid here')
    assert not isinstance(mixed, Form) or mixed.degree in (0, 1)
    total = a.sum()
    assert np.isscalar(total) or total.shape == ()


def test_component_view(lattice):
    rng = np.random.default_rng(3)
    f = random_form(lattice, 1, rng)
    for k in range(lattice.D):
        comp = f.component(k)
        assert comp.shape == lattice.dims
        assert np.array_equal(comp, np.asarray(f)[lattice.comp_index[1][(k,)]])
    if lattice.D >= 2:
        g = random_form(lattice, 2, rng)
        assert np.array_equal(g.component(0, 1), g.component((0, 1)))
        assert np.array_equal(g.component(1, 0), g.component(0, 1))


def test_interlaced_roundtrip(lattice):
    rng = np.random.default_rng(4)
    for p in range(lattice.D + 1):
        f = random_form(lattice, p, rng)
        F = f.to_interlaced()
        assert F.shape == (2 * lattice.N,) * lattice.D
        back = Form.from_interlaced(p, F, lattice)
        assert np.array_equal(np.asarray(back), np.asarray(f))
        # lattice inferred from shape
        back2 = Form.from_interlaced(p, F)
        assert np.array_equal(np.asarray(back2), np.asarray(f))


def test_face_coface_match_device_tier(lattice):
    rng = np.random.default_rng(5)
    for p in range(lattice.D + 1):
        f = random_form(lattice, p, rng)
        fs = f.face_sum()
        cs = f.coface_sum()
        if p == 0:
            assert fs == 0
        else:
            assert isinstance(fs, Form) and fs.degree == p - 1
            expected = np.asarray(calculus.face_sum(lattice, p, np.asarray(f)))
            np.testing.assert_allclose(np.asarray(fs), expected, atol=1e-6)
        if p == lattice.D:
            assert cs == 0
        else:
            assert isinstance(cs, Form) and cs.degree == p + 1
            expected = np.asarray(calculus.coface_sum(lattice, p, np.asarray(f)))
            np.testing.assert_allclose(np.asarray(cs), expected, atol=1e-6)


def test_namespace_operators_form_convention(lattice):
    rng = np.random.default_rng(6)
    f = random_form(lattice, 0, rng)
    df = d(f)
    assert isinstance(df, Form) and df.degree == 1
    # d∘d = 0 in the Form convention too
    if lattice.D >= 2:
        np.testing.assert_allclose(np.asarray(d(df)), 0, atol=1e-5)
    g = random_form(lattice, 1, rng)
    assert delta(g).degree == 0
    assert laplacian(g).degree == 1
    assert star(g).degree == lattice.D - 1
    w = wedge(f, g)
    assert isinstance(w, Form) and w.degree == 1
    # explicit device-tier signature still works through the same names
    np.testing.assert_allclose(
        np.asarray(d(lattice, 0, np.asarray(f))), np.asarray(df), atol=1e-6)


def test_namespace_operators_reject_bare_arrays(lattice):
    with pytest.raises(TypeError):
        d(np.zeros(lattice.form_shape(0)))
    with pytest.raises(TypeError):
        wedge(np.zeros(lattice.form_shape(0)), np.zeros(lattice.form_shape(1)))


def test_adjointness_in_form_convention(lattice):
    # <d a, b> = <a, delta b> via the namespace wrappers (reference test_lattice.py
    # adjointness battery, host tier).
    rng = np.random.default_rng(7)
    for p in range(lattice.D):
        a = random_form(lattice, p, rng)
        b = random_form(lattice, p + 1, rng)
        lhs = float((np.asarray(d(a)) * np.asarray(b)).sum())
        rhs = float((np.asarray(a) * np.asarray(delta(b))).sum())
        assert abs(lhs - rhs) < 1e-4 * max(1.0, abs(lhs))


def test_degree_boundary_returns_zero(lattice):
    """d of a top form and δ of a 0-form are scalar 0, as in the reference
    (compact.py:996-1000, 1035-1039) — not errors."""
    from supervillain_tpu.lattice import d, delta
    top = lattice.form(lattice.D)
    zero = lattice.form(0)
    assert d(top) == 0
    assert delta(zero) == 0
    # Chaining at the boundary therefore behaves like the reference.
    assert delta(delta(lattice.form(1))) == 0


def test_sliced_form_arithmetic_returns_plain_array(lattice):
    """Arithmetic on a sliced Form (metadata no longer matching a full form
    shape) degrades gracefully to a plain ndarray instead of crashing."""
    f = lattice.form(1, np.random.default_rng(0).normal(size=lattice.form_shape(1)))
    s = f[0] + f[0]
    assert type(s) is np.ndarray
    assert s.shape == lattice.dims
    np.testing.assert_allclose(s, 2 * np.asarray(f)[0])


def test_wedge_rejects_mismatched_lattices(lattice):
    from supervillain_tpu.lattice import Lattice, wedge
    other = Lattice(lattice.D, lattice.N + 2)
    with pytest.raises(ValueError):
        wedge(lattice.form(1), other.form(1))
