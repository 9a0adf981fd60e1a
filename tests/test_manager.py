"""Classic BDD manager: apply ops, builders, collection interop.

(ref: test/bdd/test_bdd_and_or.cpp, test_ite.cpp, test_bdd_nr_solutions.cpp,
test_bdd_multi_and.cpp)
"""
import itertools
import random

import pytest

from bdd_tpu.bdd.collection import BddCollection
from bdd_tpu.bdd.lineq import bdd_from_inequality
from bdd_tpu.bdd.manager import FALSE, TRUE, BddMgr
from bdd_tpu.ilp.model import Constraint, Ineq
from tests import fixtures


def truth_table(mgr, f, n):
    return [
        mgr.evaluate(f, bits) for bits in itertools.product((0, 1), repeat=n)
    ]


def test_apply_ops_truth_tables():
    mgr = BddMgr()
    x, y, z = (mgr.projection(v) for v in range(3))
    cases = {
        mgr.and_(x, y): lambda a: a[0] and a[1],
        mgr.or_(x, y): lambda a: a[0] or a[1],
        mgr.xor_(x, z): lambda a: a[0] != a[2],
        mgr.negate(y): lambda a: not a[1],
        mgr.ite(x, y, z): lambda a: a[1] if a[0] else a[2],
        mgr.and_(mgr.or_(x, y), mgr.negate(z)): lambda a: (a[0] or a[1]) and not a[2],
    }
    for f, fn in cases.items():
        for bits in itertools.product((0, 1), repeat=3):
            assert mgr.evaluate(f, bits) == fn(bits), bits


def test_hash_consing_canonical():
    mgr = BddMgr()
    x, y = mgr.projection(0), mgr.projection(1)
    a = mgr.and_(x, y)
    b = mgr.negate(mgr.or_(mgr.negate(x), mgr.negate(y)))  # De Morgan
    assert a == b
    assert mgr.xor_(a, b) == FALSE


def test_builders():
    mgr = BddMgr()
    vs = list(range(4))
    assert mgr.nr_solutions(mgr.simplex(vs)) == 4
    assert mgr.nr_solutions(mgr.at_most(vs, 2)) == 1 + 4 + 6
    assert mgr.nr_solutions(mgr.at_least(vs, 3)) == 4 + 1
    assert mgr.nr_solutions(mgr.cardinality(vs, 2, 2)) == 6
    assert mgr.nr_solutions(mgr.all_equal(vs)) == 2
    assert mgr.nr_solutions(mgr.at_most_one(vs)) == 5


def test_multi_and_matches_collection_meld():
    rng = random.Random(5)
    mgr = BddMgr()
    col = BddCollection()
    n = 5
    cs = []
    for _ in range(3):
        while True:
            c = fixtures.random_inequality(rng, n)
            b = bdd_from_inequality(c, col)
            if not isinstance(b, str):
                cs.append((c, b))
                break
    fs = [mgr.from_collection(col, b) for _, b in cs]
    conj = mgr.multi_and(fs)
    for bits in itertools.product((0, 1), repeat=n):
        expected = all(c.evaluate(list(bits)) for c, _ in cs)
        assert mgr.evaluate(conj, bits) == expected


def test_collection_roundtrip():
    mgr = BddMgr()
    vs = list(range(4))
    f = mgr.cardinality(vs, 1, 2)
    col = BddCollection()
    b = mgr.add_to_collection(f, col)
    assert col.nr_solutions(b) == mgr.nr_solutions(f)
    f2 = mgr.from_collection(col, b)
    assert f2 == f  # canonical => identical node


def test_rebase():
    mgr = BddMgr()
    f = mgr.and_(mgr.projection(0), mgr.projection(1))
    g = mgr.rebase(f, {0: 5, 1: 9})
    assert mgr.support(g) == [5, 9]
    full = [0] * 10
    full[5] = 1
    full[9] = 1
    assert mgr.evaluate(g, full)


def test_and_limited():
    mgr = BddMgr()
    vs = list(range(10))
    f = mgr.cardinality(vs[:5], 1, 3)
    g = mgr.cardinality(vs[5:], 2, 4)
    assert mgr.and_limited(f, g, 10000) is not None
    mgr2 = BddMgr()
    f2 = mgr2.cardinality(vs[:5], 1, 3)
    g2 = mgr2.cardinality(vs[5:], 2, 4)
    assert mgr2.and_limited(f2, g2, 0) is None


def test_cardinality_large_no_recursion_limit():
    """Constraint builders are iterative (regression: one recursion frame
    per variable blew Python's limit at n ~ 1000)."""
    m = BddMgr()
    f = m.cardinality(list(range(1500)), 1, 1)
    assert m.nr_solutions(f) == 1500
    g = m.all_equal(list(range(1500)))
    assert m.nr_solutions(g) == 2


def test_and_limited_aborts_mid_construction():
    """and_limited stops growing the manager once the budget is hit instead
    of computing the full product first."""
    m = BddMgr()
    # two interleaved cardinality constraints whose product is large
    f = m.cardinality(list(range(0, 60, 2)), 10, 20)
    g = m.cardinality(list(range(1, 60, 2)), 10, 20)
    before = m.nr_nodes()
    assert m.and_limited(f, g, node_limit=5) is None
    assert m.nr_nodes() - before <= 6  # grew by at most the budget
    # an attainable budget still succeeds
    assert m.and_limited(f, g, node_limit=10**6) is not None
