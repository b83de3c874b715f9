"""Gate-ordering invariants (round-5 verdict items 2+3).

The driver's per-round correctness gate covers a bounded prefix of
``all_queries()`` (50 names in round 5), so the ORDER is part of the
verification contract. These pins fail loudly if a refactor or a
careless prepend silently reintroduces the two process defects the
round-5 verdict called out: no-oracle names burning gate slots, and
never-checked names sitting outside the window.
"""

from cdc_kafka_project_spark.registry import (
    ORACLES,
    QUERIES,
    _GATE_PRIORITY,
    all_oracles,
    all_queries,
)


def test_priority_list_is_exact_permutation():
    """_GATE_PRIORITY must name every registered query exactly once —
    a stale list silently falls back to import order for the missing
    names, which is exactly the non-determinism the list exists to
    remove."""
    names = list(all_queries())
    assert sorted(_GATE_PRIORITY) == sorted(names)
    assert len(set(_GATE_PRIORITY)) == len(_GATE_PRIORITY)


def test_no_oracle_names_sort_after_every_oracle_backed_name():
    """The driver has NO rows-only fallback — a no-oracle name inside
    the checked prefix records err and buys zero signal. Keep all of
    them strictly behind the oracle-backed names."""
    order = list(all_queries())
    has_oracle = [n in ORACLES for n in order]
    first_no_oracle = has_oracle.index(False)
    assert all(not h for h in has_oracle[first_no_oracle:]), [
        n for n in order[first_no_oracle:] if n in ORACLES
    ]


def test_gate_window_is_fully_oracle_backed():
    """Every name in the driver's 50-slot window must be hash-checkable
    (err rows waste the round's only driver signal)."""
    window = list(all_queries())[:50]
    assert all(n in ORACLES for n in window), [
        n for n in window if n not in ORACLES
    ]


def test_oracle_dict_order_matches_query_order():
    qs = [n for n in all_queries() if n in ORACLES]
    assert qs == list(all_oracles())


def test_registered_callables_and_oracles_consistent():
    load = all_queries()
    assert set(ORACLES) <= set(QUERIES)
    assert set(load) == set(QUERIES)
