"""Topology queries (the reference URDFParser contract, SURVEY.md §2.7)."""

import numpy as np
import pytest

from gridcodegenerator_tpu.models.topology import Topology


def tree():
    #      0
    #     / \
    #    1   2
    #    |  / \
    #    3 4   5
    return Topology(parents=(-1, 0, 0, 1, 2, 2))


def test_depths_levels():
    t = tree()
    assert t.depths == (0, 1, 1, 2, 2, 2)
    assert t.levels == ((0,), (1, 2), (3, 4, 5))
    assert t.max_depth == 2
    assert t.max_level_width == 3


def test_ancestors_subtrees():
    t = tree()
    assert t.ancestors[0] == ()
    assert t.ancestors[3] == (0, 1)
    assert t.ancestors[5] == (0, 2)
    assert t.subtrees[0] == (0, 1, 2, 3, 4, 5)
    assert t.subtrees[2] == (2, 4, 5)
    assert t.subtrees[3] == (3,)
    assert t.children[2] == (4, 5)


def test_counts_match_reference_sparsity_math():
    # reference: dva_cols = total_ancestors + n; df_cols = anc + subtree
    # (``_topology_helpers.py:193-215``)
    t = tree()
    assert t.total_ancestor_count == 0 + 1 + 1 + 2 + 2 + 2
    assert t.total_subtree_count == 6 + 2 + 3 + 1 + 1 + 1


def test_masks():
    t = tree()
    am = t.ancestor_mask
    assert am[3, 0] and am[3, 1] and not am[3, 3] and not am[3, 2]
    sm = t.subtree_mask
    assert sm[2, 4] and sm[2, 2] and not sm[2, 1]
    dc = t.dc_mask
    assert dc[3, 0] and dc[3, 3] and not dc[3, 4]


def test_serial_chain_and_repeated_parents():
    chain = Topology(parents=(-1, 0, 1, 2))
    assert chain.is_serial_chain
    assert not chain.level_has_repeated_parents(1)
    t = tree()
    assert not t.is_serial_chain
    assert t.level_has_repeated_parents(1)   # 1 and 2 share parent 0
    assert t.level_has_repeated_parents(2)   # 4 and 5 share parent 2


def test_rejects_non_topological_order():
    with pytest.raises(ValueError):
        Topology(parents=(-1, 2, 0))
    with pytest.raises(ValueError):
        Topology(parents=(0,))
