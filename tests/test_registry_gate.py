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


def test_no_oracle_names_confined_to_window_tail():
    """A no-oracle name records only the weaker rows-only signal
    (spark_rows + err: no_oracle), so it must never displace a hash
    check: inside the 50-slot window such names may appear ONLY as a
    contiguous TAIL (round-10 verdict item 3 — their r3/r4-era driver
    rows are re-established this round), and behind the window they
    must not sit in front of any staler oracle-backed name's slot.
    Here we pin the strong invariant: every no-oracle name is either
    in the window tail or behind the window entirely."""
    order = list(all_queries())
    window = order[:50]
    no_oracle_in_window = [n for n in window if n not in ORACLES]
    # contiguous tail: all no-oracle window names at the very end
    assert window[50 - len(no_oracle_in_window):] == no_oracle_in_window, (
        no_oracle_in_window
    )


def test_gate_window_hash_checks_not_displaced():
    """Every window slot in front of the rows-only tail must be
    hash-checkable — an err row mid-window wastes the round's only
    driver signal for that slot."""
    window = list(all_queries())[:50]
    tail = [n for n in window if n not in ORACLES]
    head = window[: 50 - len(tail)]
    assert all(n in ORACLES for n in head), [
        n for n in head if n not in ORACLES
    ]


def test_oracle_dict_order_matches_query_order():
    qs = [n for n in all_queries() if n in ORACLES]
    assert qs == list(all_oracles())


def test_registered_callables_and_oracles_consistent():
    load = all_queries()
    assert set(ORACLES) <= set(QUERIES)
    assert set(load) == set(QUERIES)


def test_scale_sweep_exclusion_surface_is_pinned():
    """Round-12 pin (round-11 verdict item 2): the replica-scale sweep
    may exclude EXACTLY one query — similarity_pairs_above, the exact
    all-pairs O(n^2)-by-definition baseline — and only at >= 30x,
    i.e. it still runs (and ran green, r11: 139 s) at the 10x replica.
    Any new exclusion, or a lowered factor, must change this test —
    the exclusion list cannot silently widen. The digest/staged tier
    lists must name real oracle-backed queries and stay disjoint (a
    name in both would be skipped by phase 1 AND phase 2's composition
    math would double-count it)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "run_scale_sweep", os.path.join(root, "tools", "run_scale_sweep.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert set(mod.EXCLUDE_AT_FACTOR) == {
        "similarity_pairs_above",          # O(n^2) COMPUTE by definition
        # r14 measured additions — every entry records WHERE it was
        # measured and names its verified tier + scale path:
        "dedup_ngram_jaccard",             # oracle >50GB temp at 300x
        "dedup_levenshtein_verify",        # inherits ngram candidates
        "dedup_components",                # CC over the same pair graph
        "dedup_near_keep",                 # keep policy over same graph
        "pagerank_brand_copurchase",       # engine 1000x-green; oracle temp
        "brand_copurchase_lift",           # engine 1000x-green; oracle disk
    }
    spec_ = mod.EXCLUDE_AT_FACTOR["similarity_pairs_above"]
    assert spec_["min_factor"] == 30
    assert "O(n^2)" in spec_["rationale"]
    # the exact-Jaccard family stays IN the sweep through 100x (its
    # verified tier) and is excluded only at >= 300x; the two
    # lineitem graph names ran (engine-green) at 1000x and are
    # excluded only there — a lowered factor must change this test.
    for n in ("dedup_ngram_jaccard", "dedup_levenshtein_verify",
              "dedup_components", "dedup_near_keep"):
        assert mod.EXCLUDE_AT_FACTOR[n]["min_factor"] == 300
        assert "100x verified" in mod.EXCLUDE_AT_FACTOR[n]["rationale"]
    for n in ("pagerank_brand_copurchase", "brand_copurchase_lift"):
        assert mod.EXCLUDE_AT_FACTOR[n]["min_factor"] == 1000
        assert "ENGINE side digest-complete at 1000x" in \
            mod.EXCLUDE_AT_FACTOR[n]["rationale"]
    # r14: the two interval names are no longer EXCLUDED at 1000x —
    # they run against the constant-density events fixture (the r13
    # exclusions were time-compression artifacts, retired by
    # tools/make_cd_events_fixture.py). The redirect surface is
    # pinned: exactly these two names, threshold at the factor where
    # the compressed fixture stops being tractable, and a missing
    # fixture dir is a phase FAILURE (never a silent skip).
    assert set(mod.CD_FIXTURE_NAMES) == {
        "interval_incident_event_stats", "interval_incident_overlap_pairs",
    }
    assert mod.CD_MIN_FACTOR == 1000
    assert mod._run_cd_phase([], "/nonexistent", "1", None, None, "py") == 0

    class _Log:
        def __init__(self):
            self.text = ""

        def write(self, s):
            self.text += s

    log = _Log()
    rc = mod._run_cd_phase(
        list(mod.CD_FIXTURE_NAMES), "/nonexistent_cd", "1", log, {}, "py"
    )
    assert rc == 1 and "make_cd_events_fixture" in log.text
    # 10x replica (scale/sf1.0) still includes both interval names in
    # the normal tiers (compressed fixture is harsher and tractable)
    assert mod.replica_factor("spark-warehouse/scale/sf1.0") == 10
    assert mod.replica_factor("spark-warehouse/scale/sf10.0") == 100
    assert mod.replica_factor("spark-warehouse/scale/sf100.0") == 1000

    names = set(all_queries())
    digest, staged = set(mod.DIGEST_NAMES), set(mod.STAGED_NAMES)
    assert digest <= names and staged <= names
    assert not digest & staged
    # the 1000x heavy-family probe list: registered, oracle-backed
    # (its non-staged names run the digest hash tier), and covering
    # every family the r12 verdict scoped for the decade-up probe
    probe = set(mod.HEAVY_PROBE_NAMES)
    assert probe <= names
    assert probe - staged <= set(ORACLES)
    # digest-tier names must be oracle-backed (phase 2 hash-compares
    # them); staged names are verified by check_staged_oracles
    assert digest <= set(ORACLES)
    from tools.check_staged_oracles import STAGED as staged_impl

    assert staged == set(staged_impl)
