"""Property-based tests (hypothesis): core operators vs pure-Python
reference implementations on randomized inputs.

The DuckDB oracle pins behavior on the fixed synthetic tables; these
pin the *algebra* — last-writer-wins, incremental==recompute, winnowing,
components — on adversarial shapes the tables never produce (ties,
empty groups, singleton keys, disconnected graphs). Example counts are
small (Spark round-trip per example) but each example is a full
end-to-end check against an independent implementation.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from cdc_kafka_project_spark.operators import cdc
from cdc_kafka_project_spark.operators.dedup import connected_components
from cdc_kafka_project_spark.operators.text import (
    ROLL_B,
    ROLL_P,
    winnow_fingerprints,
)

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# (key, ts, seq, value): seq is the log-position tiebreaker
change_rows = st.lists(
    st.tuples(
        st.integers(0, 5),
        st.integers(0, 3),
        st.integers(0, 1000),
        st.integers(-100, 100),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1], r[2]),
)


def _latest_ref(rows):
    best = {}
    for k, ts, seq, v in rows:
        if k not in best or (ts, seq) > (best[k][1], best[k][2]):
            best[k] = (k, ts, seq, v)
    return sorted(best.values())


@given(rows=change_rows)
@settings(**SETTINGS)
def test_latest_per_key_matches_reference(spark, rows):
    df = spark.createDataFrame(rows, "k int, ts int, seq int, v int")
    got = sorted(
        tuple(r) for r in cdc.latest_per_key(df, ["k"], ["ts", "seq"]).collect()
    )
    assert got == _latest_ref(rows)


@given(rows=change_rows, split=st.integers(0, 3))
@settings(**SETTINGS)
def test_merge_upsert_equals_full_recompute(spark, rows, split):
    """apply(old) merged with new == apply(full log), for every split
    point — the MERGE maintenance invariant (SURVEY §2 #16-#18)."""
    rows = [(k, ts, seq, "update" if v >= 0 else "delete") for k, ts, seq, v in rows]
    schema = "k int, ts int, seq int, action string"
    full = spark.createDataFrame(rows, schema)
    old = spark.createDataFrame(
        [r for r in rows if r[1] <= split], schema
    )
    new_rows = [r for r in rows if r[1] > split]
    want = sorted(
        tuple(r)
        for r in cdc.apply_changes(
            full, ["k"], ["ts", "seq"], "action", "delete"
        ).collect()
    )
    if not new_rows:
        got_df = cdc.apply_changes(old, ["k"], ["ts", "seq"], "action", "delete")
    else:
        new = spark.createDataFrame(new_rows, schema)
        base = cdc.apply_changes(old, ["k"], ["ts", "seq"], "action", "delete")
        got_df = cdc.merge_upsert(base, new, ["k"], ["ts", "seq"], "action")
        got_df = got_df.filter("lower(action) != 'delete'")
    assert sorted(tuple(r) for r in got_df.collect()) == want


def _winnow_ref(text: str, k: int, w: int) -> set[int]:
    n = len(text) - k + 1
    if n < 1:
        return set()
    hs = []
    for i in range(n):
        acc = 0
        for ch in text[i : i + k]:
            acc = (acc * ROLL_B + ord(ch)) % ROLL_P
        hs.append(acc)
    if n <= w:
        return {min(hs)}
    return {min(hs[i : i + w]) for i in range(n - w + 1)}


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=1000),
            max_size=60,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**SETTINGS)
def test_winnow_fingerprints_match_reference(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints(df, k=8, w=4).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)
    want = {
        i: _winnow_ref(t, 8, 4) for i, t in rows if len(t) >= 8
    }
    want = {i: s for i, s in want.items() if s}
    assert got == want


def _components_ref(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    return {n: min(m for m in parent if find(m) == find(n)) for n in parent}


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=15,
    )
)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components(df).collect()}
    assert got == _components_ref(pairs)


# -- snapshot_diff: replaying the diff reconstructs the new snapshot --------

snapshot = st.dictionaries(
    st.integers(0, 9),                      # key
    st.tuples(st.integers(-5, 5),           # val (small range -> collisions)
              st.one_of(st.none(), st.text("ab", max_size=2))),
    max_size=10,
)


@given(old=snapshot, new=snapshot)
@settings(**SETTINGS)
def test_snapshot_diff_replay_reconstructs_new(spark, old, new):
    """diff(old, new) replayed onto old == new, for any pair of
    snapshots (incl. NULL values and empty sides) — the round-trip law
    that makes trigger-less capture trustworthy."""
    schema = "id long, val int, tag string"
    old_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in old.items()], schema
    )
    new_df = spark.createDataFrame(
        [(k, v[0], v[1]) for k, v in new.items()], schema
    )
    diff = cdc.snapshot_diff(old_df, new_df, ["id"]).collect()
    state = dict(old)
    for r in diff:
        if r.action == "delete":
            state.pop(r.id, None)
        else:
            state[r.id] = (r.val, r.tag)
    assert state == new
    # and the diff is minimal: unchanged keys never appear
    touched = {r.id for r in diff}
    for k in set(old) & set(new):
        if old[k] == new[k]:
            assert k not in touched


# -- scd2_history: versions partition the per-key timeline ------------------

scd_events = st.lists(
    st.tuples(st.integers(0, 3),            # key (few keys -> long chains)
              st.integers(0, 50),           # ts (collisions exercised)
              st.integers(-5, 5)),          # value
    min_size=0,
    max_size=14,
)


@given(rows=scd_events)
@settings(**SETTINGS)
def test_scd2_versions_chain_and_single_current(spark, rows):
    """For any change log: per key, ordered versions chain exactly
    (valid_to[i] == valid_from[i+1]), the last (and only the last)
    version is current, and no event is lost or invented."""
    events = [(k, t, v, i) for i, (k, t, v) in enumerate(rows)]
    df = spark.createDataFrame(events, "k long, t long, v long, seq long")
    hist = cdc.scd2_history(
        df, key_cols=["k"], order_cols=["t", "seq"], ts_col="t"
    ).collect()
    assert len(hist) == len(events)
    by_key = {}
    for r in hist:
        by_key.setdefault(r.k, []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: (r.t, r.seq))
        for a, b in zip(versions, versions[1:]):
            assert not a.is_current
            assert a.valid_to_ts == b.t
        assert versions[-1].is_current and versions[-1].valid_to_ts is None


# -- merge_agg_states: any base/delta split == full recompute ---------------


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(-100, 100)),
        max_size=20,
    ),
    pivot=st.integers(0, 20),
)
@settings(**SETTINGS)
def test_merge_agg_states_split_invariant(spark, rows, pivot):
    """Splitting a log at ANY point and merging the two aggregate
    states reproduces the full recompute exactly — the associativity
    contract incremental maintenance rests on."""
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "k long, v long, i long"
    )

    def agg(d):
        return d.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    merged = cdc.merge_agg_states(
        agg(df.filter(F.col("i") < pivot)),
        agg(df.filter(F.col("i") >= pivot)),
        key_cols=["k"],
        sum_cols=["n", "s"],
    )
    got = {r.k: (r.n, r.s) for r in merged.collect()}
    want = {r.k: (r.n, r.s) for r in agg(df).collect()}
    assert got == want


# asof: left rows (key, ts, tag) and right rows (key, ts, value) with
# unique (key, ts) on the right — the operator's documented precondition
asof_left = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(0, 999)),
    min_size=1,
    max_size=15,
)
asof_right = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 20), st.integers(-50, 50)),
    min_size=0,
    max_size=15,
    unique_by=lambda r: (r[0], r[1]),
)


def _asof_dir_ref(left_row, right, direction):
    k, lt, _ = left_row
    cands = [
        (rt, v)
        for rk, rt, v in right
        if rk == k and (rt <= lt if direction == "backward" else rt >= lt)
    ]
    if not cands:
        return None
    return (max if direction == "backward" else min)(cands)


def _asof_ref(left, right, direction):
    out = []
    for row in left:
        k, lt, tag = row
        if direction == "nearest":
            b = _asof_dir_ref(row, right, "backward")
            f = _asof_dir_ref(row, right, "forward")
            if b is not None and (f is None or lt - b[0] <= f[0] - lt):
                m = b
            else:
                m = f
        else:
            m = _asof_dir_ref(row, right, direction)
        out.append(
            (k, lt, tag, None, None) if m is None else (k, lt, tag, m[1], m[0])
        )
    return sorted(out, key=lambda t: (t[0], t[1], t[2]))


@given(left=asof_left, right=asof_right,
       direction=st.sampled_from(["backward", "forward", "nearest"]))
@settings(**SETTINGS)
def test_asof_join_matches_reference(spark, left, right, direction):
    """asof_join (both directions) vs a per-row reference: inclusive
    bounds, no-match NULLs, arbitrary key overlap — integer 'seconds'
    stand in for timestamps via timestamp_seconds."""
    from cdc_kafka_project_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        left, "k int, lt int, tag int"
    ).selectExpr("k", "timestamp_seconds(lt) AS ts", "tag")
    rdf = spark.createDataFrame(
        right, "k int, rt int, v int"
    ).selectExpr("k", "timestamp_seconds(rt) AS ts", "v")
    got = sorted(
        (
            r.k,
            int(r.ts.timestamp()),
            r.tag,
            r.v_asof,
            None if r.ts_asof is None else int(r.ts_asof.timestamp()),
        )
        for r in asof_join(ldf, rdf, ["k"], direction=direction).collect()
    )
    assert got == _asof_ref(left, right, direction)


joins_big = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 10_000)),
    min_size=1, max_size=30, unique_by=lambda r: r[1],
)
joins_small = st.lists(
    st.tuples(st.integers(0, 4), st.integers(-9, 9)),
    min_size=0, max_size=10,
)


@given(big=joins_big, small=joins_small,
       how=st.sampled_from(["inner", "left"]), n_salt=st.sampled_from([1, 3, 8]))
@settings(**SETTINGS)
def test_salted_join_equals_plain_join(spark, big, small, how, n_salt):
    from cdc_kafka_project_spark.operators.skew import salted_join

    bdf = spark.createDataFrame(big, "k int, row_id long")
    sdf = spark.createDataFrame(small, "k int, v int") if small else (
        spark.createDataFrame([], "k int, v int")
    )
    plain = sorted(
        (r.k, r.row_id, r.v) for r in bdf.join(sdf, "k", how).collect()
    )
    salted = sorted(
        (r.k, r.row_id, r.v)
        for r in salted_join(bdf, sdf, ["k"], n_salt=n_salt, how=how).collect()
    )
    assert salted == plain


hh_items = st.lists(st.integers(0, 30), min_size=1, max_size=120)


@given(items=hh_items, k=st.sampled_from([1, 3, 5]))
@settings(**SETTINGS)
def test_heavy_hitters_exact_with_ample_capacity(spark, items, k):
    """capacity >= |distinct| makes Misra-Gries lossless in every
    partition, so the result must equal the exact top-k for ANY input."""
    from collections import Counter

    from cdc_kafka_project_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(f"w{x:02d}",) for x in items], "word string"
    ).repartition(4)
    got = [(r.word, r.n) for r in heavy_hitters(df, "word", k=k, capacity=64).collect()]
    cnt = Counter(f"w{x:02d}" for x in items)
    want = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    assert got == want


# -- binned interval joins == brute-force non-equi join ----------------------

_ts_base = 1_700_000_000  # seconds

interval_rows = st.lists(
    st.tuples(
        st.integers(0, 50_000),          # start offset seconds
        st.integers(0, 10_000),          # duration seconds (may be 0)
    ),
    min_size=0,
    max_size=12,
)
point_rows = st.lists(st.integers(0, 60_000), min_size=0, max_size=20)


@given(points=point_rows, intervals=interval_rows,
       width=st.sampled_from([60, 3600, 86_400]))
@settings(**SETTINGS)
def test_bin_point_interval_join_equals_brute_force(spark, points, intervals, width):
    import datetime as dt

    from cdc_kafka_project_spark.operators.intervals import (
        bin_point_interval_join,
    )

    base = dt.datetime(2023, 11, 14, 22, 13, 20)
    facts = spark.createDataFrame(
        [(i, base + dt.timedelta(seconds=s)) for i, s in enumerate(points)],
        "fact_id long, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(intervals)
        ],
        "win_id long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        (r.fact_id, r.win_id)
        for r in bin_point_interval_join(facts, ivs, "ts", bin_width_sec=width)
        .select("fact_id", "win_id")
        .collect()
    )
    want = sorted(
        (i, j)
        for i, s in enumerate(points)
        for j, (s0, d) in enumerate(intervals)
        if s0 <= s <= s0 + d
    )
    assert got == want


@given(intervals=interval_rows, width=st.sampled_from([60, 3600]))
@settings(**SETTINGS)
def test_bin_overlap_join_equals_brute_force(spark, intervals, width):
    import datetime as dt

    from cdc_kafka_project_spark.operators.intervals import (
        bin_interval_overlap_join,
    )

    base = dt.datetime(2023, 11, 14, 22, 13, 20)
    left = spark.createDataFrame(
        [
            (j, base + dt.timedelta(seconds=s), base + dt.timedelta(seconds=s + d))
            for j, (s, d) in enumerate(intervals)
        ],
        "win_id long, start_ts timestamp, end_ts timestamp",
    )
    right = (
        left.withColumnRenamed("win_id", "r_win_id")
        .withColumnRenamed("start_ts", "r_start_ts")
        .withColumnRenamed("end_ts", "r_end_ts")
    )
    got = sorted(
        (r.win_id, r.r_win_id)
        for r in bin_interval_overlap_join(left, right, bin_width_sec=width)
        .select("win_id", "r_win_id")
        .collect()
    )
    want = sorted(
        (a, b)
        for a, (sa, da) in enumerate(intervals)
        for b, (sb, db) in enumerate(intervals)
        if sa <= sb + db and sb <= sa + da
    )
    assert got == want


@given(
    payloads=st.lists(
        st.one_of(
            st.text(max_size=60),
            st.text(max_size=40).map(lambda s: "{" + s),
            st.sampled_from(
                [
                    "null",
                    "[]",
                    '{"op": 7}',
                    '{"after": "notastruct", "op": "c"}',
                    '{"before": {}, "after": {}, "op": "U", "ts_ms": "x"}',
                ]
            ),
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_debezium_decode_never_crashes_and_routes_corruption(spark, payloads):
    """Fuzz the Debezium decoder: ANY value bytes either decode to a
    typed event or come out with op IS NULL (the DLQ route) — never an
    exception, never a silently fabricated op code."""
    from pyspark.sql.types import StructType

    from cdc_kafka_project_spark.streaming.kafka_io import decode_debezium

    row_schema = StructType.fromDDL("emp_id long, salary long")
    raw = spark.createDataFrame(
        [(str(i), p) for i, p in enumerate(payloads)],
        "key string, value string",
    )
    out = decode_debezium(raw, row_schema).collect()
    assert len(out) == len(payloads)
    for r in out:
        assert r["op"] is None or isinstance(r["op"], str)
        if r["op"] is None:
            # corrupt: entire event nulled, original bytes preserved
            assert r["row"] is None and r["ts_ms"] is None
            assert r["raw_value"] is not None


# ---------------------------------------------------------------------------
# Bloom semi-join prefilter (operators/bloom.py)
# ---------------------------------------------------------------------------

bloom_fact_keys = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40
)
bloom_dim_keys = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=15
)


@given(fact=bloom_fact_keys, dim=bloom_dim_keys)
@settings(**SETTINGS)
def test_bloom_semi_join_equals_plain_semi_join(spark, fact, dim):
    """Exactness property over arbitrary long keys (incl. negatives and
    values near the 64-bit edge): the bloom tier must be invisible."""
    from cdc_kafka_project_spark.operators.bloom import bloom_semi_join

    f = spark.createDataFrame([(k,) for k in fact], "fk long")
    d = spark.createDataFrame([(k,) for k in dim], "dk long") if dim else (
        spark.createDataFrame([], "dk long")
    )
    got = sorted(
        r["fk"] for r in bloom_semi_join(f, d, "fk", "dk").collect()
    )
    want = sorted(k for k in fact if k in set(dim))
    assert got == want
