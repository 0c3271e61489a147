"""Property-based and randomized-oracle tests.

Two layers beyond the table-driven/parity suites:

- hypothesis properties over the PURE functions (type mapping): no Spark,
  thousands of generated cases.
- randomized-oracle checks for composite operators (as-of join,
  sessionization): one seeded random dataset, Spark result compared to an
  independent pure-Python reimplementation row by row.
"""

from __future__ import annotations

import datetime as dt
import random

from hypothesis import given, settings, strategies as st
from pyspark.sql import types as T

from etl_to_iceberg_spark.types import oracle_type_to_spark

# --- hypothesis: type mapping is total, stable, and param-insensitive ------

_BASE_TYPES = [
    "NUMBER", "FLOAT", "BINARY_FLOAT", "BINARY_DOUBLE", "VARCHAR2", "CHAR",
    "NCHAR", "NVARCHAR2", "CLOB", "NCLOB", "DATE", "TIMESTAMP", "RAW", "BLOB",
]


@given(
    base=st.sampled_from(_BASE_TYPES),
    precision=st.one_of(st.none(), st.integers(1, 38)),
    scale=st.one_of(st.none(), st.integers(0, 10)),
    lower=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_mapping_total_and_case_insensitive(base, precision, scale, lower):
    name = base.lower() if lower else base
    out = oracle_type_to_spark(name, precision, scale)
    assert isinstance(out, T.DataType)
    # case must not change the result
    assert out == oracle_type_to_spark(base, precision, scale)


@given(
    precision=st.integers(1, 38),
    scale=st.integers(1, 10),
)
@settings(max_examples=200, deadline=None)
def test_number_with_scale_never_loses_decimals(precision, scale):
    """Faithful mode: NUMBER(p, s>0) must be Decimal, never an integer type
    (the reference's lossy Long mapping is opt-in compat only)."""
    out = oracle_type_to_spark("NUMBER", precision, scale)
    assert isinstance(out, T.DecimalType)
    assert out.scale > 0
    compat = oracle_type_to_spark("NUMBER", precision, scale, number_as_long=True)
    assert compat == T.LongType()


@given(text=st.text(min_size=1, max_size=30))
@settings(max_examples=200, deadline=None)
def test_mapping_never_raises(text):
    """Any junk type name falls back to StringType — total function."""
    out = oracle_type_to_spark(text)
    assert isinstance(out, T.DataType)


# --- randomized oracle: as-of join vs pure-Python reimplementation ---------


def test_asof_join_matches_python_oracle(spark):
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.operators.advanced import asof_join

    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    lefts = [
        (k, base + dt.timedelta(minutes=rng.randrange(0, 3000)), i)
        for i, k in enumerate(rng.choices(range(8), k=120))
    ]
    rights = [
        (k, base + dt.timedelta(minutes=rng.randrange(0, 3000)), 1000 + i)
        for i, k in enumerate(rng.choices(range(8), k=90))
    ]
    # unique ts per key on the right (asof semantics need a deterministic
    # winner at equal timestamps)
    seen = set()
    rights = [
        r for r in rights
        if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))
    ]
    ldf = spark.createDataFrame(lefts, "k long, ts timestamp, lid long")
    rdf = spark.createDataFrame(rights, "k long, ts timestamp, rid long")

    got = {
        (r["k"], r["ts"], r["lid"]): r["asof_rid"]
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
            right_payload=["rid"],
        ).collect()
    }

    # independent reimplementation
    want = {}
    for k, lts, lid in lefts:
        cands = [(rts, rid) for rk, rts, rid in rights if rk == k and rts <= lts]
        if cands:
            want[(k, lts, lid)] = max(cands)[1]
    assert got == want


def test_asof_join_null_payload_is_a_match_not_a_skip(spark):
    """A right row whose payload VALUE is null is still the as-of match —
    it must neither be skipped (returning an older non-null payload) nor
    drop the left row (which only happens when NO prior right row exists).
    Regression: the pre-struct implementation keyed match detection off
    payload-column nullability and failed both ways."""
    from etl_to_iceberg_spark.operators.advanced import asof_join

    ldf = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 6), 10),   # after the null-payload row
         (1, dt.datetime(2024, 1, 1, 0, 2), 11),   # after only the 'a' row
         (2, dt.datetime(2024, 1, 1, 0, 9), 12),   # only prior row has null payload
         (3, dt.datetime(2024, 1, 1, 0, 9), 13)],  # no prior right row at all
        "k long, ts timestamp, lid long",
    )
    rdf = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 1), "a", 100),
         (1, dt.datetime(2024, 1, 1, 0, 5), None, 101),
         (2, dt.datetime(2024, 1, 1, 0, 1), None, 102)],
        "k long, ts timestamp, payload string, rid long",
    )
    got = {
        r["lid"]: (r["asof_payload"], r["asof_rid"])
        for r in asof_join(
            ldf, rdf, on=["k"], left_ts="ts", right_ts="ts",
            right_payload=["payload", "rid"],
        ).collect()
    }
    assert got == {
        10: (None, 101),  # latest prior row wins even with null payload
        11: ("a", 100),
        12: (None, 102),  # null-payload-only history still matches
        # lid 13 absent: genuinely no prior right row
    }


def test_sessionize_matches_python_oracle(spark):
    from etl_to_iceberg_spark.streaming.windows import sessionize

    rng = random.Random(11)
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for user in range(6):
        t = base
        for _ in range(rng.randrange(3, 25)):
            t = t + dt.timedelta(minutes=rng.randrange(1, 90))
            rows.append((user, t, eid))
            eid += 1
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {
        (r["user_id"], r["session_id"]): (r["session_start"], r["session_end"], r["n_events"])
        for r in sessionize(df, gap="30 minutes").collect()
    }

    want = {}
    for user in range(6):
        evs = sorted((t for u, t, _ in rows if u == user))
        sid, start, prev, n = 0, None, None, 0
        for t in evs:
            if prev is None or (t - prev) > dt.timedelta(minutes=30):
                if start is not None:
                    want[(user, sid)] = (start, prev, n)
                sid += 1
                start, n = t, 0
            n += 1
            prev = t
        want[(user, sid)] = (start, prev, n)
    assert got == want


def test_exact_sum_is_partition_order_independent(spark):
    """The engine-wide exact-decimal sum must be bit-identical across
    partition layouts (plain SUM(double) is not)."""
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.functions import exact_sum

    rng = random.Random(3)
    vals = [(i, rng.uniform(-1e6, 1e6)) for i in range(20_000)]
    df = spark.createDataFrame(vals, "id long, v double")
    results = {
        df.repartition(n).agg(exact_sum("v").alias("s")).collect()[0]["s"]
        for n in (1, 7, 32)
    }
    assert len(results) == 1, f"layout-dependent sum: {results}"


def test_connected_components_matches_union_find_oracle(spark):
    """Random sparse graphs: the distributed label propagation must agree
    with a driver-side union-find on every node."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    rng = random.Random(11)
    for trial in range(3):
        n = rng.randrange(10, 60)
        nodes = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(0, n))
        ]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        want = {x: find(x) for x in nodes}
        # canonical root = min of component
        comp = {}
        for x in nodes:
            comp.setdefault(find(x), []).append(x)
        want = {x: min(comp[find(x)]) for x in nodes}

        edges_df = spark.createDataFrame(
            edges or [(0, 0)], "src long, dst long"
        )
        nodes_df = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(edges_df, nodes_df).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"


def test_connected_components_random_graphs_through_pointer_doubling(spark):
    """The same random-graph-vs-union-find sweep, but forced through the
    DISTRIBUTED bridge path (VERDICT r11): ``driver_bridge_max=0``
    disables the driver merge and the edge list is spread over more
    partitions than any component spans, so the local contraction
    genuinely disagrees across partitions and pointer doubling must
    reconcile it. The deterministic chain test (test_ext.py) plants one
    such graph; random graphs are what historically surface the cases a
    planted one misses."""
    from etl_to_iceberg_spark.ext.dedup import connected_components

    rng = random.Random(23)
    saw_doubling = False
    for trial in range(3):
        n = rng.randrange(20, 60)
        nodes = list(range(n))
        # a planted chain guarantees a multi-partition component; random
        # extra edges vary the bridge-graph shape per trial
        chain_len = rng.randrange(8, 16)
        edges = [(i, i + 1) for i in range(chain_len)]
        edges += [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(0, n))
        ]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comp = {}
        for x in nodes:
            comp.setdefault(find(x), []).append(x)
        want = {x: min(comp[find(x)]) for x in nodes}

        edges_df = spark.createDataFrame(
            edges, "src long, dst long"
        ).repartition(len(edges))  # one edge per task: maximal disagreement
        nodes_df = spark.createDataFrame([(x,) for x in nodes], "doc_id long")
        stats: dict = {}
        got = {
            r.doc_id: r.cluster_id
            for r in connected_components(
                edges_df, nodes_df, stats=stats, driver_bridge_max=0
            ).collect()
        }
        assert got == want, f"trial {trial}: {got} != {want}"
        saw_doubling = saw_doubling or stats["bridge_strategy"] == "pointer-doubling"
    assert saw_doubling, "no trial exercised the distributed bridge fixpoint"


def test_minhash_collapse_preserves_pair_closure(spark):
    """Random corpora with planted duplicate groups: the collapsed pipeline
    (identical docs -> one representative + rep->member edges) must yield
    the SAME transitive closure (dedup clusters) as the uncollapsed one —
    the guarantee the hot-bucket guard is allowed to rely on."""
    from etl_to_iceberg_spark.ext.dedup import (
        connected_components,
        minhash_near_duplicates,
    )

    words_pool = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven twelve",
        "red orange yellow green blue indigo violet white black brown",
    ]
    rng = random.Random(7)
    rows = []
    doc_id = 0
    for base in words_pool:
        copies = rng.randrange(2, 5)
        for _ in range(copies):  # identical group
            rows.append((doc_id, base)); doc_id += 1
        # one near-dup (drop last word)
        rows.append((doc_id, base.rsplit(" ", 1)[0])); doc_id += 1
    for _ in range(5):  # unrelated singletons
        rows.append((doc_id, " ".join(rng.sample(
            "zz qq ww ee rr tt yy uu ii oo pp aa ss dd ff gg".split(), 8))))
        doc_id += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def clusters(pairs):
        edges = pairs.selectExpr("id_a as src", "id_b as dst")
        labels = connected_components(edges, docs, id_col="doc_id")
        comp = {}
        for r in labels.collect():
            comp.setdefault(r.cluster_id, set()).add(r.doc_id)
        return {frozenset(v) for v in comp.values()}

    collapsed = clusters(minhash_near_duplicates(docs, threshold=0.5))
    full = clusters(
        minhash_near_duplicates(
            docs, threshold=0.5, collapse_identical=False, max_bucket_size=None
        )
    )
    assert collapsed == full


# ---- schema evolution (pure function) ----------------------------------

_EVOLVE_TYPES = None


def _evolve_types():
    global _EVOLVE_TYPES
    if _EVOLVE_TYPES is None:
        from pyspark.sql import types as T

        _EVOLVE_TYPES = [
            T.LongType(), T.DoubleType(), T.StringType(), T.BooleanType()
        ]
    return _EVOLVE_TYPES


@given(
    st.data(),
)
@settings(max_examples=50, deadline=None)
def test_evolve_schema_union_properties(data):
    from pyspark.sql import types as T

    from etl_to_iceberg_spark.tables.format import _evolve_schema

    names = data.draw(
        st.lists(
            st.text(alphabet="abcdef", min_size=1, max_size=4),
            min_size=1, max_size=6, unique=True,
        )
    )
    tys = _evolve_types()
    old_fields = [
        T.StructField(n, data.draw(st.sampled_from(tys))) for n in names
    ]
    old = T.StructType(old_fields)
    # new schema: any subset of old columns (same types) + fresh columns
    keep = data.draw(st.sets(st.sampled_from(names)))
    fresh = data.draw(
        st.lists(
            st.text(alphabet="wxyz", min_size=1, max_size=4),
            max_size=4, unique=True,
        )
    )
    by_name = {f.name: f for f in old_fields}
    new = T.StructType(
        [T.StructField(n, by_name[n].dataType) for n in keep]
        + [T.StructField(n, data.draw(st.sampled_from(tys))) for n in fresh]
    )
    out = _evolve_schema(old, new)
    # old columns keep their order and types; fresh columns append, nullable
    assert [f.name for f in out.fields][: len(old_fields)] == names
    assert [f.name for f in out.fields][len(old_fields):] == [
        n for n in fresh
    ]
    for f in out.fields[len(old_fields):]:
        assert f.nullable
    # idempotent: evolving again with the same batch changes nothing
    assert _evolve_schema(out, new) == out


def test_evolve_schema_nullability_is_not_a_type_change():
    """array<long> with containsNull flipped is the SAME column (an empty
    seed batch infers permissive flags; a computed batch infers strict
    ones) — evolution must widen to the union of flags, not reject.
    Caught live by tests/test_incremental.py's randomized tick sweep."""
    from pyspark.sql import types as T

    from etl_to_iceberg_spark.tables.format import _evolve_schema

    loose = T.StructType(
        [T.StructField("sig", T.ArrayType(T.LongType(), True), True)]
    )
    strict = T.StructType(
        [T.StructField("sig", T.ArrayType(T.LongType(), False), False)]
    )
    for old, new in ((loose, strict), (strict, loose)):
        out = _evolve_schema(old, new)
        assert out.fields[0].dataType.containsNull and out.fields[0].nullable
    # nested: map value struct nullability also widens, shape still checked
    m_loose = T.StructType(
        [
            T.StructField(
                "m",
                T.MapType(
                    T.StringType(),
                    T.StructType([T.StructField("x", T.LongType(), True)]),
                    True,
                ),
            )
        ]
    )
    m_strict = T.StructType(
        [
            T.StructField(
                "m",
                T.MapType(
                    T.StringType(),
                    T.StructType([T.StructField("x", T.LongType(), False)]),
                    False,
                ),
            )
        ]
    )
    out = _evolve_schema(m_strict, m_loose)
    mt = out.fields[0].dataType
    assert mt.valueContainsNull and mt.valueType.fields[0].nullable
    # a genuinely different element type still rejects
    import pytest as _pytest

    bad = T.StructType(
        [T.StructField("sig", T.ArrayType(T.StringType(), True), True)]
    )
    with _pytest.raises(TypeError):
        _evolve_schema(loose, bad)


@given(st.sampled_from(["bigint", "string", "double"]))
@settings(max_examples=10, deadline=None)
def test_evolve_schema_rejects_type_change(tname):
    import pytest
    from pyspark.sql import types as T

    from etl_to_iceberg_spark.tables.format import _evolve_schema

    old = T.StructType([T.StructField("k", T.LongType())])
    newtype = {"bigint": T.BooleanType(), "string": T.StringType(),
               "double": T.DoubleType()}[tname]
    new = T.StructType([T.StructField("k", newtype)])
    with pytest.raises(TypeError):
        _evolve_schema(old, new)


# --- randomized-oracle sweep: MERGE vs a pure-Python reference -------------


import pytest


@pytest.mark.parametrize("seed", [20250813, 971])
def test_merge_randomized_equivalence_sweep(spark, tmp_path, seed):
    """MERGE (file-pruned COW, tables/format.py) must equal the plain
    window-dedup + keyed-upsert semantics across a random operation
    sequence: overlapping keys, in-batch duplicate keys, schema evolution
    mid-sweep, a MOR delete whose tombstones a later merge must not
    resurrect, and a delete-matched-when clause. The reference model is a
    dict keyed by primary key, updated latest-ts-wins."""
    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("p.merge_sweep")

    state: dict[int, dict] = {}  # the pure-Python reference table
    counter = [0]
    has_extra = False

    def make_batch(n):
        rows = []
        for _ in range(n):
            counter[0] += 1
            row = {
                "k": rng.randrange(30),
                "ts": counter[0],  # globally unique: no order ties
                "v": rng.randrange(100),
                "name": rng.choice(["alpha", "beta", "gamma"]),
            }
            if has_extra:
                row["extra"] = rng.randrange(10)
            rows.append(row)
        return rows

    def spark_df(rows):
        ddl = "k int, ts long, v int, name string" + (
            ", extra int" if has_extra else ""
        )
        data = [
            tuple(r[c] for c in ("k", "ts", "v", "name", "extra")[: 5 if has_extra else 4])
            for r in rows
        ]
        return spark.createDataFrame(data, ddl)

    def ref_merge(rows, delete_when=None):
        best: dict[int, dict] = {}
        for r in rows:  # latest ts per key wins (the window dedup)
            if r["k"] not in best or r["ts"] > best[r["k"]]["ts"]:
                best[r["k"]] = r
        for k, r in best.items():
            if delete_when is not None and k in state and delete_when(r):
                state.pop(k)
            else:
                state[k] = dict(r)

    def check():
        cols = sorted(c for c in ("k", "ts", "v", "name", "extra")
                      if has_extra or c != "extra")
        got = sorted(
            (tuple(row[c] for c in cols)
             for row in (r.asDict() for r in t.read().collect())),
            key=repr,  # None-safe canonical order
        )
        want = sorted(
            (tuple(r.get(c) for c in cols) for r in state.values()), key=repr
        )
        assert got == want

    for step in range(10):
        if step == 4:
            has_extra = True  # schema evolution: later batches carry a new col
        if step == 6:
            # MOR delete; merge afterwards must not resurrect these rows
            t.delete_where("v >= 80", mode="mor")
            for k in [k for k, r in state.items() if r["v"] >= 80]:
                state.pop(k)
            check()
            continue
        rows = make_batch(rng.randrange(1, 20))
        if step == 7:
            t.merge(spark_df(rows), keys=["k"], dedup_order_by=["ts"],
                    delete_matched_when="v < 30")
            ref_merge(rows, delete_when=lambda r: r["v"] < 30)
        else:
            t.merge(spark_df(rows), keys=["k"], dedup_order_by=["ts"])
            ref_merge(rows)
        check()


@pytest.mark.parametrize("seed", [7, 4242])
def test_table_lifecycle_randomized_sweep(spark, tmp_path, seed):
    """Randomized sequence over the full snapshot-table lifecycle —
    append, overwrite, keyed MERGE, COW and MOR deletes, compaction
    (materializes tombstones), rollback (restores tombstone state),
    snapshot expiry — with the logical table compared to a pure-Python
    model after every operation, AND a random retained historical version
    time-travel-read and compared to the model state recorded when it was
    current (r7: history immutability under later rewrites). The
    era-gating of MOR tombstones against later appends, their clearance
    by compaction, and their restoration by rollback are the interactions
    example tests cover one at a time; this drives them composed in
    random order."""
    from etl_to_iceberg_spark.tables import Catalog, maintenance

    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("p.lifecycle")

    counter = [0]

    def make_batch(n):
        rows = []
        for _ in range(n):
            counter[0] += 1
            rows.append((counter[0], rng.randrange(100),
                         rng.choice(["alpha", "beta", "gamma"])))
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v int, name string")

    PREDS = [
        ("v < 40", lambda r: r[1] < 40),
        ("name = 'alpha'", lambda r: r[2] == "alpha"),
        ("v >= 70", lambda r: r[1] >= 70),
    ]

    model: list[tuple] = []
    states: dict[int, list[tuple]] = {}

    def record():
        states[t.current_version()] = list(model)

    def check():
        got = sorted(tuple(r) for r in t.read().collect())
        assert got == sorted(model)
        # history immutability: a RETAINED older version must still read
        # as the state recorded when it was current, whatever rewrites
        # (COW deletes, compaction, MERGE) happened since
        live = [s.version for s in t.snapshots() if s.version in states]
        if live:
            rv = rng.choice(live)
            got_v = sorted(tuple(r) for r in t.read(version=rv).collect())
            assert got_v == sorted(states[rv]), f"time travel to v{rv}"

    first = make_batch(rng.randrange(3, 10))
    t.append(df_of(first))
    model.extend(first)
    record()
    check()

    for _ in range(14):
        op = rng.choices(
            ["append", "overwrite", "merge", "delete_mor", "delete_cow",
             "compact", "rollback", "expire", "evolve_spec"],
            weights=[30, 8, 12, 14, 9, 9, 13, 5, 10],
        )[0]
        if op == "merge":
            # keyed upsert composed with the rest of the lifecycle: half
            # updates of live keys, half fresh inserts (unique per batch)
            live_keys = [r[0] for r in model]
            src = {}
            for _ in range(rng.randrange(1, 6)):
                if live_keys and rng.random() < 0.5:
                    k = rng.choice(live_keys)
                else:
                    counter[0] += 1
                    k = counter[0]
                src[k] = (k, rng.randrange(100),
                          rng.choice(["alpha", "beta", "gamma"]))
            t.merge(df_of(list(src.values())), keys=["k"])
            by_k = {r[0]: r for r in model}
            by_k.update(src)
            model = list(by_k.values())
        elif op == "append":
            rows = make_batch(rng.randrange(1, 8))
            t.append(df_of(rows))
            model.extend(rows)
        elif op == "overwrite":
            rows = make_batch(rng.randrange(2, 6))
            t.overwrite(df_of(rows))
            model = list(rows)
        elif op in ("delete_mor", "delete_cow"):
            sql_pred, py_pred = rng.choice(PREDS)
            t.delete_where(sql_pred, mode="mor" if op == "delete_mor" else "cow")
            model = [r for r in model if not py_pred(r)]
        elif op == "compact":
            maintenance.compact(t, target_file_size_mb=1)
        elif op == "rollback":
            candidates = [s.version for s in t.snapshots()
                          if s.version != t.current_version() and s.version in states]
            if candidates:
                v = rng.choice(candidates)
                maintenance.rollback(t, v)
                model = list(states[v])
        elif op == "expire":
            maintenance.expire_snapshots(t, older_than_ms=2**62, retain_last=3)
        elif op == "evolve_spec":
            # Layout is invisible to the logical table: evolving the
            # partition spec mid-history (including between a MOR delete
            # and its compaction, or across a later rollback) must never
            # change what reads return.
            t.evolve_partition_spec(rng.choice([[], ["name"], ["v"]]))
        record()
        check()


# --- composed lifecycle x incremental-read sweep (VERDICT r5 #3) -----------
#
# 210 short random programs over {append, MOR delete, COW delete, compact,
# overwrite, expire}, each followed by a full-table check and randomized
# incremental_read range checks against a pure-Python model:
#
# - rows-added over a clean (append/compact-only) range == the union of the
#   appended batches (compaction snapshots are data-neutral and skipped);
# - a range crossing ANY rewrite snapshot (overwrite / COW or MOR delete)
#   raises under on_rewrite="error" and delivers exactly the appended
#   batches (raw, tombstones not applied) under on_rewrite="skip";
# - expiry never breaks ranges between SURVIVING snapshots.
#
# Programs are independent tables, so they run 8-way threaded — also a
# concurrency smoke of the commit path under one SparkSession.


def _lifecycle_program(spark, wh_dir: str, rng: random.Random) -> dict:
    from etl_to_iceberg_spark.tables import Catalog, maintenance

    cat = Catalog(spark, wh_dir)
    t = cat.table("p.prog")
    counter = [0]

    def batch(n):
        rows = []
        for _ in range(n):
            counter[0] += 1
            rows.append((counter[0], rng.randrange(100),
                         rng.choice(["alpha", "beta", "gamma"])))
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v int, name string")

    PREDS = [
        ("v < 40", lambda r: r[1] < 40),
        ("name = 'alpha'", lambda r: r[2] == "alpha"),
        ("v >= 70", lambda r: r[1] >= 70),
    ]

    model: list[tuple] = []
    adds: dict[int, list[tuple]] = {}   # version -> rows that append added
    rewrote: set[int] = set()           # versions whose op is a data rewrite

    first = batch(rng.randint(2, 5))
    t.append(df_of(first))
    model.extend(first)
    adds[t.current_version()] = list(first)

    for _ in range(rng.randint(2, 5)):
        op = rng.choices(
            ["append", "delete_mor", "delete_cow", "compact", "overwrite",
             "expire", "evolve_spec"],
            weights=[45, 15, 10, 12, 8, 10, 10],
        )[0]
        if op == "append":
            rows = batch(rng.randint(1, 5))
            t.append(df_of(rows))
            model.extend(rows)
            adds[t.current_version()] = list(rows)
        elif op in ("delete_mor", "delete_cow"):
            sql_pred, py_pred = rng.choice(PREDS)
            t.delete_where(sql_pred, mode="mor" if op == "delete_mor" else "cow")
            model = [r for r in model if not py_pred(r)]
            rewrote.add(t.current_version())
        elif op == "compact":
            maintenance.compact(t, target_file_size_mb=1)
        elif op == "overwrite":
            rows = batch(rng.randint(1, 4))
            t.overwrite(df_of(rows))
            model = list(rows)
            rewrote.add(t.current_version())
        elif op == "expire":
            maintenance.expire_snapshots(
                t, older_than_ms=2**62, retain_last=rng.randint(2, 4)
            )
        elif op == "evolve_spec":
            # data-neutral: delivers no rows in any incremental range and
            # never makes a clean range count as rewritten
            t.evolve_partition_spec(rng.choice([[], ["name"], ["v"]]))

    # full-table parity after the composed program
    assert sorted(tuple(r) for r in t.read().collect()) == sorted(model)

    stats = {"clean": 0, "rewrite": 0}
    survivors = sorted(s.version for s in t.snapshots())
    if len(survivors) >= 2:
        for _ in range(min(3, len(survivors) - 1)):
            v1, v2 = sorted(rng.sample(survivors, 2))
            expected = sorted(
                r for v in survivors if v1 < v <= v2 for r in adds.get(v, [])
            )
            crossed = any(v1 < v <= v2 for v in rewrote)
            if crossed:
                stats["rewrite"] += 1
                try:
                    t.incremental_read(v1, v2)
                    raise AssertionError(
                        f"range ({v1},{v2}] crosses a rewrite, no error"
                    )
                except ValueError:
                    pass
                got = sorted(
                    tuple(r)
                    for r in t.incremental_read(v1, v2, on_rewrite="skip").collect()
                )
            else:
                stats["clean"] += 1
                got = sorted(
                    tuple(r) for r in t.incremental_read(v1, v2).collect()
                )
            assert got == expected, (v1, v2, crossed)
    return stats


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_lifecycle_incremental_read_randomized_sweep(spark, tmp_path, seed):
    from concurrent.futures import ThreadPoolExecutor

    master = random.Random(seed)
    program_seeds = [master.randrange(1 << 30) for _ in range(70)]

    def run(i_s):
        i, s = i_s
        return _lifecycle_program(
            spark, str(tmp_path / f"wh{i}"), random.Random(s)
        )

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(run, enumerate(program_seeds)))

    # the sweep must actually exercise both range classes, not skate by
    assert sum(r["clean"] for r in results) > 10
    assert sum(r["rewrite"] for r in results) > 10


@pytest.mark.parametrize("seed", [11, 2026])
def test_schema_evolution_randomized_sweep(spark, tmp_path, seed):
    """Progressive column additions arriving through BOTH writers (append
    and MERGE), interleaved with MOR deletes, checked against a dict
    model after every step: pre-evolution rows must read NULL for later
    columns, evolved columns survive deletes, and MERGE's UPDATE SET *
    over a wider schema never nulls data it shouldn't."""
    from etl_to_iceberg_spark.tables import Catalog

    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("p.evolve")

    all_extra = ["c1", "c2", "c3"]
    active: list[str] = []
    counter = [0]
    model: dict[int, dict] = {}

    def make_rows(n):
        rows = []
        for _ in range(n):
            counter[0] += 1
            r = {"k": counter[0], "v": rng.randrange(100)}
            for c in active:
                r[c] = rng.randrange(10)
            rows.append(r)
        return rows

    def df_of(rows):
        ddl = "k long, v int" + "".join(f", {c} int" for c in active)
        return spark.createDataFrame(
            [tuple(r.get(c) for c in ["k", "v", *active]) for r in rows], ddl
        )

    def check():
        cols = ["k", "v", *active]
        got = sorted(
            (tuple(row[c] if c in row.asDict() else None for c in cols)
             for row in t.read().collect()),
            key=repr,
        )
        want = sorted(
            (tuple(r.get(c) for c in cols) for r in model.values()), key=repr
        )
        assert got == want

    rows = make_rows(5)
    t.append(df_of(rows))
    model.update({r["k"]: r for r in rows})
    check()

    for step in range(12):
        if all_extra and rng.random() < 0.3:
            active.append(all_extra.pop(0))  # evolution event
        op = rng.choices(["append", "merge", "delete_mor"], weights=[45, 35, 20])[0]
        if op == "append":
            rows = make_rows(rng.randrange(1, 5))
            t.append(df_of(rows))
            model.update({r["k"]: r for r in rows})
        elif op == "merge":
            # half updates of existing keys, half inserts
            rows = make_rows(rng.randrange(1, 4))
            existing = rng.sample(sorted(model), min(2, len(model)))
            for k in existing:
                r = {"k": k, "v": rng.randrange(100)}
                for c in active:
                    r[c] = rng.randrange(10)
                rows.append(r)
            t.merge(df_of(rows), keys=["k"])
            model.update({r["k"]: r for r in rows})
        else:
            t.delete_where("v < 20", mode="mor")
            model = {k: r for k, r in model.items() if not r["v"] < 20}
        check()


# --- exact-substring spans vs a brute-force Python model -------------------


def _py_spans(docs: dict[int, list[str]], n: int, min_span: int):
    """Brute-force model: all maximal diagonal runs of matching n-grams
    between each doc pair, as (id_a, id_b, a_start, b_start, span)."""
    out = set()
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ta, tb = docs[a], docs[b]
            ga = {i: tuple(ta[i:i + n]) for i in range(len(ta) - n + 1)}
            gb = {j: tuple(tb[j:j + n]) for j in range(len(tb) - n + 1)}
            anchors = {
                (i, j) for i, g in ga.items() for j, h in gb.items() if g == h
            }
            # maximal diagonal runs
            for (i, j) in anchors:
                if (i - 1, j - 1) in anchors:
                    continue  # not a run start
                k = 0
                while (i + k + 1, j + k + 1) in anchors:
                    k += 1
                span = k + n
                if span >= min_span:
                    out.add((a, b, i, j, span))
    return out


@pytest.mark.parametrize("seed", [5, 17])
def test_exact_substring_spans_match_python_model(spark, seed):
    """Randomized docs over a tiny vocabulary (heavy accidental n-gram
    overlap) — Spark's capped-join + gaps-and-islands span merge must
    produce EXACTLY the brute-force model's maximal spans."""
    from etl_to_iceberg_spark.ext.dedup import exact_substring_spans

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d"]
    docs = {
        i: [rng.choice(vocab) for _ in range(rng.randint(6, 40))]
        for i in range(10)
    }
    # plant one long shared run to guarantee non-trivial cases
    shared = [rng.choice(vocab) for _ in range(12)]
    docs[3] = docs[3][:4] + shared + docs[3][4:]
    docs[7] = shared + docs[7][:6]

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b, r.a_start, r.b_start, r.span_tokens)
        for r in exact_substring_spans(
            df, gram_n=4, min_span_tokens=6, max_gram_freq=None
        ).collect()
    }
    expect = _py_spans(docs, n=4, min_span=6)
    assert got == expect


# --- cherrypick x rollback x append sweep (r7) ------------------------------


@pytest.mark.parametrize("seed", [13, 777, 90210])
def test_cherrypick_rollback_append_randomized_sweep(spark, tmp_path, seed):
    """cherrypick composed with rollback and append in random order vs a
    set-of-appends model. In an append-only history files are never
    rewritten, so each snapshot's delta is exactly its append batch and
    the model is clean: the table state at any version is the UNION of
    the append-versions it includes. cherrypick(a) must re-add a's batch
    iff a rollback removed it, and be a content no-op when a's files are
    already present (the path-dedup guard); time-travel reads of every
    retained version must keep matching the include-set recorded when it
    was current. Cherrypick's append-only guard itself is pinned by
    rejecting a rollback snapshot."""
    from etl_to_iceberg_spark.tables import Catalog, maintenance

    rng = random.Random(seed)
    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.table("p.cherry")

    counter = [0]

    def make_batch():
        rows = []
        for _ in range(rng.randrange(1, 5)):
            counter[0] += 1
            rows.append((counter[0], rng.randrange(100)))
        return rows

    def df_of(rows):
        return spark.createDataFrame(rows, "k long, v int")

    deltas: dict[int, list[tuple]] = {}   # append version -> its batch
    include: dict[int, frozenset[int]] = {}  # version -> appends included

    rows0 = make_batch()
    t.append(df_of(rows0))
    v = t.current_version()
    deltas[v] = rows0
    cur: set[int] = {v}
    include[v] = frozenset(cur)

    def check():
        want = sorted(r for a in cur for r in deltas[a])
        got = sorted(tuple(r) for r in t.read().collect())
        assert got == want
        for w in (s.version for s in t.snapshots()):
            if w in include:
                got_w = sorted(tuple(r) for r in t.read(version=w).collect())
                assert got_w == sorted(
                    r for a in include[w] for r in deltas[a]
                ), f"time travel to v{w}"

    non_append_versions: list[int] = []
    for _ in range(16):
        op = rng.choices(["append", "rollback", "cherrypick"], [5, 3, 3])[0]
        if op == "append":
            rows = make_batch()
            t.append(df_of(rows))
            v = t.current_version()
            deltas[v] = rows
            cur = cur | {v}
        elif op == "rollback":
            candidates = [w for w in include if w != t.current_version()]
            if not candidates:
                continue
            w = rng.choice(candidates)
            maintenance.rollback(t, w)
            v = t.current_version()
            cur = set(include[w])
            non_append_versions.append(v)
        else:  # cherrypick a random prior append (possibly already present)
            a = rng.choice(list(deltas))
            maintenance.cherrypick(t, a)
            v = t.current_version()
            cur = cur | {a}
            non_append_versions.append(v)
        include[v] = frozenset(cur)
        check()

    # the append-only guard: a rollback/cherrypick snapshot is refused
    if non_append_versions:
        with pytest.raises(ValueError, match="cherry-pick"):
            maintenance.cherrypick(t, rng.choice(non_append_versions))


def test_simhash_pairs_matches_python_oracle(spark):
    """Seeded randomized sweep for the relational half of the simhash
    pipeline (simhash_pairs, split out in r8 for the sidecar oracle):
    random 32-bit signatures with planted identical-sig groups and
    1-3-bit-flip neighbors, checked pair-for-pair against a pure-Python
    model of collapse -> byte-band candidates -> hamming <= 3."""
    import itertools
    import random

    from etl_to_iceberg_spark.ext.dedup import simhash_pairs

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        sigs: dict[int, int] = {}
        nid = 0
        for _ in range(40):
            base = rng.getrandbits(32)
            group = rng.choice([1, 1, 1, 2, 5])  # some identical-sig groups
            for _ in range(group):
                sigs[nid] = base
                nid += 1
            if rng.random() < 0.5:  # a near neighbor: flip 1-3 bits
                s = base
                for b in rng.sample(range(32), rng.randint(1, 3)):
                    s ^= 1 << b
                sigs[nid] = s
                nid += 1
            if rng.random() < 0.3:  # a far point: flip 8-16 bits
                s = base
                for b in rng.sample(range(32), rng.randint(8, 16)):
                    s ^= 1 << b
                sigs[nid] = s
                nid += 1

        # pure-Python model
        rep = {}
        for i, s in sigs.items():
            rep.setdefault(s, i)  # first (lowest) id per signature
        exact_edges = {
            (rep[s], i, 0) for i, s in sigs.items() if rep[s] != i
        }
        reps = sorted(set(rep.values()))
        near = set()
        for a, b in itertools.combinations(reps, 2):
            sa, sb = sigs[a], sigs[b]
            shares_byte = any(
                (sa >> (8 * k)) & 0xFF == (sb >> (8 * k)) & 0xFF
                for k in range(4)
            )
            h = bin(sa ^ sb).count("1")
            if shares_byte and h <= 3:
                near.add((a, b, h))
        expected = near | exact_edges

        df = spark.createDataFrame(
            [(i, s) for i, s in sigs.items()], "doc_id long, simhash long"
        )
        got = {
            (r.id_a, r.id_b, r.hamming)
            for r in simhash_pairs(df, max_hamming=3).collect()
        }
        assert got == expected, (
            f"seed {seed}: missing={sorted(expected - got)[:5]} "
            f"extra={sorted(got - expected)[:5]}"
        )


@pytest.mark.parametrize("seed", [301, 302, 303])
def test_best_cells_packed_argmax_matches_window(spark, seed):
    """_best_cells' n_best=1 fast path packs (rounded-6dp cosine, cell)
    into ONE long — score scaled to an integer in the high bits,
    (2^32−1−cell) in the low bits — so a codegen HashAggregate `max`
    reproduces the window order (score desc, cell asc) without a
    SortAggregate (similarity.py:_best_cells). The packing is monotone
    only if the scale-to-integer is exact and the cell complement never
    borrows into the score bits; this sweep drives the packed path and
    the window path it replaced over adversarial scores — exact ties
    across many cells, the −1.0 zero-norm convention, ±1.0 extremes,
    and 6dp boundary neighbors (±0.9999995, ±0.000001) — and requires
    bit-identical winners. Raw scores (including 7dp values the packing
    canNOT represent) pass through the same F.round(…, 6) every caller
    applies, which is the contract that makes the scale-to-integer
    exact: feeding 0.9999995 UNrounded would collide with 1.0 in the
    packed representation — by design, since no caller produces it."""
    import random as _random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from etl_to_iceberg_spark.ext.similarity import _best_cells

    rng = _random.Random(seed)
    boundary = [
        -1.0, 1.0, 0.0, -0.000001, 0.000001, 0.9999995, -0.9999995,
        0.999999, -0.999999, 0.5, -0.5,
    ]
    rows = []
    n_ids, n_cells = 40, 25
    for i in range(n_ids):
        # a few ids get EXACT tie scores across all cells (winner must
        # be the lowest cell id), the rest mix boundary + random 6dp
        tie_score = round(rng.uniform(-1, 1), 6) if i % 7 == 0 else None
        for cell in range(n_cells):
            if tie_score is not None:
                s = tie_score
            elif rng.random() < 0.3:
                s = rng.choice(boundary)
            else:
                s = round(rng.uniform(-1, 1), 6)
            rows.append((i, [float(i)], cell, s))
    df = spark.createDataFrame(
        rows, "id long, vec array<double>, cell int, __cs double"
    ).withColumn("__cs", F.round("__cs", 6))  # the callers' contract

    packed = {
        (r.id, r.cell)
        for r in _best_cells(df, "id", "vec", 1, with_vector=False).collect()
    }
    w = Window.partitionBy("id").orderBy(F.col("__cs").desc(), F.col("cell"))
    windowed = {
        (r.id, r.cell)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "cell")
        .collect()
    }
    assert packed == windowed
    assert len(packed) == n_ids, "an id vanished from the packed argmax"
