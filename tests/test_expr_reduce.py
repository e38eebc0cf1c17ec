"""Algebraic reduction rules of the expr factories.

Mirrors the behavioural assertions of the reference's arithmetic_test.cpp
(the reduce() rewrite system: constant folding, identity elimination, fma
formation, exponent gathering) and math_test.cpp's sqrt/exp/log inverse
rules, plus random_test.cpp's graph-identity guards (r+r must NOT fold;
r+0 must).  Structure checks use isinstance in place of the reference's
*_cast; numeric checks use evaluate().
"""

import numpy as np
import pytest

from graph_framework_tpu import expr as g


@pytest.fixture
def x():
    return g.variable(1, 10.0, "x")


@pytest.fixture
def y():
    return g.variable(1, 5.0, "y")


# -- constant folding (arithmetic_test.cpp:28-98) ---------------------------

def test_constant_folding():
    assert isinstance(g.constant(1.0) + g.constant(2.0), g.Constant)
    assert (g.constant(1.0) + g.constant(2.0)).value == 3.0
    assert (g.constant(5.0) - g.constant(2.0)).value == 3.0
    assert (g.constant(4.0) * g.constant(2.0)).value == 8.0
    assert (g.constant(8.0) / g.constant(2.0)).value == 4.0
    assert (g.constant(2.0) ** g.constant(3.0)).value == 8.0
    assert g.sqrt(g.constant(9.0)).value == 3.0
    assert g.exp(g.constant(0.0)).value == 1.0
    assert g.log(g.constant(1.0)).value == 0.0


def test_division_by_zero_constant_not_folded():
    d = g.constant(1.0) / g.constant(0.0)
    assert isinstance(d, g.Div)        # folding would bake an inf


# -- identity elimination (arithmetic_test.cpp:40-55) -----------------------

def test_add_zero_identity(x):
    assert (x + 0.0) is x
    assert (0.0 + x) is x


def test_sub_identities(x):
    assert (x - 0.0) is x
    neg = 0.0 - x
    assert isinstance(neg, g.Mul)
    assert np.asarray(neg.evaluate())[0] == -10.0
    assert isinstance(x - x, g.Constant) and (x - x).is_(0)


def test_mul_identities(x):
    assert (x * 1.0) is x
    assert (1.0 * x) is x
    assert isinstance(x * 0.0, g.Constant) and (x * 0.0).is_(0)
    assert isinstance(0.0 * x, g.Constant)


def test_div_identities(x):
    assert (x / 1.0) is x
    assert isinstance(x / x, g.Constant) and (x / x).is_(1)
    z = g.constant(0.0) / x
    assert isinstance(z, g.Constant) and z.is_(0)


# -- a+a -> 2a (arithmetic_test.cpp:60-65), constant-left normalization -----

def test_add_same_becomes_multiply(x):
    two_x = x + x
    assert isinstance(two_x, g.Mul)
    assert isinstance(two_x.a, g.Constant) and two_x.a.is_(2)
    assert np.asarray(two_x.evaluate())[0] == 20.0


def test_constant_moves_left(x):
    m = x * 2.0
    assert isinstance(m, g.Mul)
    assert isinstance(m.a, g.Constant)


def test_nested_constant_gathering(x):
    m = 2.0 * (3.0 * x)
    assert isinstance(m, g.Mul)
    assert isinstance(m.a, g.Constant) and m.a.is_(6)
    assert m.b is x


# -- fma formation (arithmetic_test.cpp:154-232) ----------------------------

def test_fma_formation(x, y):
    assert isinstance(x * y + 3.0, g.Fma)
    assert isinstance(3.0 + x * y, g.Fma)
    f = x * y + 3.0
    assert np.asarray(f.evaluate())[0] == 53.0


def test_fma_reductions(x, y):
    assert g.fma(0.0, x, y) is y
    assert g.fma(x, 0.0, y) is y
    assert isinstance(g.fma(1.0, x, y), (g.Add, g.Fma, g.Mul))
    assert np.asarray(g.fma(1.0, x, y).evaluate())[0] == 15.0
    c = g.fma(2.0, g.constant(3.0), g.constant(4.0))
    assert isinstance(c, g.Constant) and c.value == 10.0
    m = g.fma(x, y, 0.0)
    assert isinstance(m, g.Mul)


# -- exponent gathering (arithmetic_test.cpp common-power cases) ------------

def test_exponent_gathering(x):
    sq = x * x
    assert isinstance(sq, g.Pow)
    assert sq.b.is_(2)
    cube = x * sq
    assert isinstance(cube, g.Pow) and cube.b.is_(3)
    five = sq * (x ** 3.0)
    assert isinstance(five, g.Pow) and five.b.is_(5)
    assert np.asarray(five.evaluate())[0] == 1.0e5


def test_pow_identities(x):
    assert (x ** 1.0) is x
    p0 = x ** 0.0
    assert isinstance(p0, g.Constant) and p0.is_(1)
    nested = (x ** 2.0) ** 3.0
    assert isinstance(nested, g.Pow) and nested.b.is_(6)


# -- sqrt/exp/log inverses (math_test.cpp) ----------------------------------

def test_sqrt_of_square(x):
    assert g.sqrt(x * x) is x            # sqrt(x*x): math.hpp sqrt rule
    assert g.sqrt(x ** 2.0) is x
    assert (g.sqrt(x) ** 2.0) is x


def test_exp_log_inverses(x):
    assert g.exp(g.log(x)) is x
    assert g.log(g.exp(x)) is x


# -- random-node guards (random_test.cpp:29-80 graph-identity rules) --------

def test_random_identity_rules():
    r = g.random(8)
    assert (r + 0.0) is r                # identity elimination stays
    assert (r * 1.0) is r
    rr = r + r
    assert isinstance(rr, g.Add)         # two draws do NOT fold to 2r
    assert isinstance(r - r, g.Sub)      # and do not cancel
    assert isinstance(r / r, g.Div)
    assert isinstance(r * r, g.Mul)      # no exponent gathering


# -- Expr.reduce() over hand-built trees ------------------------------------

def test_reduce_method_on_raw_nodes(x):
    raw = g.Add(g.Mul(g.Constant(1.0), x), g.Constant(0.0))
    red = raw.reduce()
    assert red is x
    raw2 = g.Mul(g.Constant(2.0), g.Mul(g.Constant(3.0), x))
    red2 = raw2.reduce()
    assert isinstance(red2, g.Mul) and red2.a.is_(6)


def test_reduce_after_remove_pseudo(x):
    p = g.pseudo_variable(x * 0.0)
    e = g.Add(p, x)
    stripped = e.remove_pseudo().reduce()
    assert stripped is x


# -- df stays compact through the factories ---------------------------------

def test_df_compaction(x):
    d = (x ** 3.0).df(x)
    assert np.asarray(d.evaluate())[0] == 300.0
    assert isinstance(d, g.Mul)
    assert d.a.is_(3)
    dc = (x * x + 2.0 * x + 1.0).df(x)
    # derivative graph folds its zero branches away
    assert all(not isinstance(n, g.Add) or not (
        isinstance(n.a, g.Constant) and n.a.is_(0))
        for n in g.walk(dc))
    assert np.asarray(dc.evaluate())[0] == 22.0


def test_df_of_constant_subtree_folds(x, y):
    e = g.constant(4.0) * y + x * 0.0 + g.constant(7.0)
    d = e.df(y)
    assert isinstance(d, g.Constant) and d.is_(4)


# -- numeric equivalence spot-check ------------------------------------------

def test_reductions_preserve_values():
    rng = np.random.default_rng(3)
    a = g.variable(16, rng.uniform(0.5, 2.0, 16), "a")
    b = g.variable(16, rng.uniform(0.5, 2.0, 16), "b")
    e = ((a * b + a) / (b + 1.0) - a) + (a ** 2.0) / a + g.sqrt(b * b)
    got = np.asarray(e.evaluate())
    av, bv = a.data, b.data
    want = ((av * bv + av) / (bv + 1.0) - av) + av + bv
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_tan_composite():
    """tan = sin/cos composite (trigonometry.hpp:539)."""
    x = g.variable(4, 0.3, "x")
    t = g.tan(x)
    np.testing.assert_allclose(np.asarray(t.evaluate()),
                               np.tan(0.3) * np.ones(4), rtol=1e-12)
    # derivative: d tan/dx = 1/cos^2 = 1 + tan^2
    d = t.df(x)
    np.testing.assert_allclose(np.asarray(d.evaluate()),
                               1.0 / np.cos(0.3) ** 2 * np.ones(4),
                               rtol=1e-12)


def test_piecewise_constant_folding():
    """c OP table folds into one new table; table OP table with a shared
    argument likewise (arithmetic.hpp is_constant_combinable, :24-61,
    192-248)."""
    x = g.variable(3, 1.2, "x")
    data = np.array([1.0, 2.0, 3.0, 4.0])
    t = g.piecewise_1D(data, x, 1.0, 0.0)
    e = g.add(g.constant(10.0), t)
    assert isinstance(e, g.Piecewise1D)
    np.testing.assert_allclose(e.data, data + 10.0)
    e2 = g.mul(t, g.constant(2.0))
    assert isinstance(e2, g.Piecewise1D)
    np.testing.assert_allclose(e2.data, data * 2.0)
    # same-argument table pair folds to one table
    t2 = g.piecewise_1D(data * 3, x, 1.0, 0.0)
    e3 = g.add(t, t2)
    assert isinstance(e3, g.Piecewise1D)
    np.testing.assert_allclose(e3.data, data * 4.0)
    # different scale does NOT fold
    t3 = g.piecewise_1D(data, x, 2.0, 0.0)
    assert not isinstance(g.add(t, t3), g.Piecewise1D) or \
        g.add(t, t3) is not t


def test_piecewise_2d_row_col_extraction():
    """A constant argument reduces piecewise_2D to a 1D row/column table
    (piecewise.hpp:856-940); both constant -> a constant."""
    x = g.variable(2, 0.0, "x")
    data = np.arange(12.0).reshape(3, 4)
    # constant x -> row
    e = g.piecewise_2D(data, 4, g.constant(2.0), 1.0, 0.0, x, 1.0, 0.0)
    assert isinstance(e, g.Piecewise1D)
    np.testing.assert_allclose(e.data, data[2, :])
    # constant y -> column
    e = g.piecewise_2D(data, 4, x, 1.0, 0.0, g.constant(1.0), 1.0, 0.0)
    assert isinstance(e, g.Piecewise1D)
    np.testing.assert_allclose(e.data, data[:, 1])
    # both constant -> scalar constant (clamped truncating index)
    e = g.piecewise_2D(data, 4, g.constant(2.7), 1.0, 0.0,
                       g.constant(99.0), 1.0, 0.0)
    assert isinstance(e, g.Constant) and e.value == data[2, 3]
    # all-equal table -> constant
    e = g.piecewise_1D(np.full(5, 7.0), x, 1.0, 0.0)
    assert isinstance(e, g.Constant) and e.value == 7.0
