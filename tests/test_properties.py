"""Property-based cross-engine determinism tests (hypothesis).

The whole oracle strategy rests on two row-local primitives producing
BIT-IDENTICAL results in Spark and DuckDB: the scaled-BIGINT exact-sum
units (norms.py §5.3 — every money/value aggregate goes through them)
and the md5 hash bucket (sampling.py — every sampling/split decision).
These tests throw adversarial doubles / keys at both engines in one
batch per example (one Spark job each, so hypothesis stays fast) and
require exact equality — not closeness.
"""

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from data_webhooks_spark.norms import MONEY_SCALE, _o_units, _scaled_units

# Doubles in the magnitude range every money/value column inhabits,
# plus adversarial .xx5 half-way rounding boundaries (the sign-branched
# FLOOR must round them away from zero identically on both engines).
_money = st.one_of(
    st.floats(
        min_value=-1e9,
        max_value=1e9,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    st.integers(min_value=-(10**9), max_value=10**9).map(
        lambda n: n / 100 + 0.005
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_money, min_size=1, max_size=300))
def test_scaled_units_bit_identical_across_engines(spark, values):
    from pyspark.sql import functions as F

    pdf = pd.DataFrame({"x": pd.Series(values, dtype="float64")})
    got = [
        r["u"]
        for r in spark.createDataFrame(pdf)
        .select(_scaled_units(F.col("x"), MONEY_SCALE).alias("u"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {_o_units('x', MONEY_SCALE)} FROM t"
        ).fetchall()
    ]
    assert [int(g) for g in got] == [int(w) for w in want]


_key = st.one_of(
    st.integers(min_value=-(2**62), max_value=2**62).map(str),
    st.text(
        alphabet=st.characters(min_codepoint=1, blacklist_categories=("Cs",)),
        max_size=40,
    ),
)


@settings(max_examples=8, deadline=None)
@given(st.lists(_key, min_size=1, max_size=200))
def test_hash_bucket_bit_identical_across_engines(spark, keys):
    from pyspark.sql import functions as F

    from data_webhooks_spark.operators.sampling import (
        hash_bucket,
        o_hash_bucket,
    )

    pdf = pd.DataFrame({"k": pd.Series(keys, dtype="object")})
    got = [
        r["b"]
        for r in spark.createDataFrame(pdf)
        .select(hash_bucket(F.col("k")).alias("b"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(f"SELECT {o_hash_bucket('k')} FROM t").fetchall()
    ]
    assert got == [int(w) for w in want]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
                width=64,
            ),
            # adversarial values straddling the 1e-6 quantization grid
            st.integers(min_value=-(10**12), max_value=10**12).map(
                lambda n: n / 1e6 + 5e-7
            ),
        ),
        min_size=1,
        max_size=300,
    )
)
def test_qnt_bit_identical_across_engines(spark, values):
    """The per-row quantizer (norms.qnt / o_qnt) — the third primitive
    every float output column rests on — must produce the identical
    double on both engines, including at half-way grid points."""
    from pyspark.sql import functions as F

    from data_webhooks_spark.norms import o_qnt, qnt

    pdf = pd.DataFrame({"x": pd.Series(values, dtype="float64")})
    got = [
        r["q"]
        for r in spark.createDataFrame(pdf)
        .select(qnt(F.col("x"), "q"))
        .collect()
    ]
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0] for r in con.execute(f"SELECT {o_qnt('x', 'q')} FROM t").fetchall()
    ]
    assert got == want  # exact float equality, not closeness


# Star-contraction connected components vs a pure-Python union-find —
# the oracle-independent third derivation (the r4 zero-row lesson)
# for the r8 _connected_components rewrite. Random graphs cover the
# shapes fixtures never produce: chains grafted onto cliques, isolated
# edges, duplicate/reversed edges.
_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=40),
        st.integers(min_value=0, max_value=40),
    ).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=60,
)


@settings(max_examples=6, deadline=None)
@given(_edges)
def test_star_contraction_matches_union_find(spark, edges):
    from data_webhooks_spark.operators.dedup import _connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {}
    for n in parent:
        root = find(n)
        # canonical root = component minimum (paths compress to it
        # because union always hooks the larger root under the smaller)
        if n != root:
            want[n] = root
    # nodes whose component min is themselves are absent from the
    # star labels too
    df = spark.createDataFrame(edges, "u long, v long")
    labels, rounds = _connected_components(df)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got == want, (sorted(got.items()), sorted(want.items()))
    n_nodes = len({x for e in edges for x in e})
    assert rounds <= 2 * max(n_nodes, 2).bit_length() + 2


def test_infinite_money_treated_as_missing_on_both_engines(spark):
    """±inf/NaN are OUT OF DOMAIN for the exact cent-unit BIGINT
    discipline, and the engine-wide policy (norms.py, scenario N) is
    non-finite-as-MISSING at every quantization seam: the seam yields
    NULL, aggregates skip the value, and BOTH engines do so
    identically — never an asymmetric crash or a saturated garbage
    total. (This test previously pinned the pre-scenario-N loud-crash
    contract; the crash class it guarded against — one corrupt row
    killing a 100 TB job — is exactly what the missing policy
    removes.)"""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from data_webhooks_spark.norms import MONEY_SCALE, _o_units, _scaled_units

    pdf = pd.DataFrame(
        {"x": [1.5, float("inf"), float("-inf"), float("nan"), 2.25]}
    )
    got = (
        spark.createDataFrame(pdf)
        .select(F.sum(_scaled_units(F.col("x"), MONEY_SCALE)).alias("u"))
        .collect()[0]["u"]
    )
    # finite rows only: (1.5 + 2.25) * 10^scale units
    want = int(round(3.75 * 10**MONEY_SCALE))
    assert got == want, got
    con = duckdb.connect()
    con.register("t", pdf)
    duck = con.execute(
        f"SELECT SUM({_o_units('x', MONEY_SCALE)}) FROM t"
    ).fetchone()[0]
    assert int(duck) == want, duck


# The r9 range-sharded two-pass ECDF (drift_ks_test) vs a pure-Python
# exact KS — the oracle-independent third derivation for the rewrite
# that closed the last data-cardinality-unpartitioned window. Random
# value multisets cover what fixtures never produce: heavy ties
# (many rows per distinct value, exercising the per-distinct-value
# pre-aggregate), skewed shard occupancy, and tiny inputs where most
# percentile_approx shards are empty.
_ks_vals = st.lists(
    st.floats(min_value=-100, max_value=100, allow_nan=False,
              allow_infinity=False).map(lambda x: round(x, 1)),
    min_size=1,
    max_size=80,
)


@settings(max_examples=6, deadline=None)
@given(_ks_vals, _ks_vals)
def test_sharded_ks_matches_python_reference(spark, tmp_path_factory, a, b):
    import math
    import os

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from data_webhooks_spark.operators.drift import drift_ks_test
    from data_webhooks_spark.schemas import TABLE_NAMES

    rows = [("purchase", v) for v in a] + [("click", v) for v in b]
    pdf = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.Timestamp("2024-01-01"),
            "user_id": 1,
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": "{}",
        }
    )
    sf = str(tmp_path_factory.mktemp("ksprop"))
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
        f"{sf}/events.parquet",
    )
    for t in TABLE_NAMES:
        p = f"{sf}/{t}.parquet"
        if not os.path.exists(p):
            os.symlink(f"/root/testdata/sf0.001/{t}.parquet", p)

    out = drift_ks_test(spark, sf).collect()
    assert len(out) == 1
    row = out[0]
    # pure-Python exact KS at value boundaries, same qnt quantization
    na, nb = len(a), len(b)
    d = max(
        abs(
            sum(1 for x in a if x <= v) / na
            - sum(1 for x in b if x <= v) / nb
        )
        for v in set(a) | set(b)
    )
    want = math.floor(d * 1e6 + 0.5) / 1e6
    assert (row["n_a"], row["n_b"]) == (na, nb)
    assert row["ks_stat"] == want


def test_dedup_cluster_replica_collapse(spark):
    """Exact-replica collapse in dedup_cluster's candidate generation
    (r9 verdict item 3): k identical copies of a document must cost
    k-1 star edges, NOT C(k,2) quadratic candidate pairs, and the
    resulting clusters must be exactly the full-pairwise answer —
    replicas cluster with their original, near-dups still connect
    through representatives, shingle-less docs stay singletons."""
    from data_webhooks_spark.operators.dedup import _cluster_candidates

    k = 10
    base = {
        # two near-dup texts (share most trigrams, J >= 0.6), one far
        0: "alpha beta gamma delta epsilon zeta eta theta",
        1: "alpha beta gamma delta epsilon zeta eta iota",
        2: "one two three four five six seven eight nine",
    }
    rows = [(doc_id, text) for doc_id, text in base.items()]
    # k-1 extra exact replicas of each base doc (amplified-sweep shape)
    next_id = 100
    for doc_id, text in base.items():
        for _ in range(k - 1):
            rows.append((next_id, text))
            next_id += 1
    # two shingle-less docs with IDENTICAL short text: no trigram ->
    # no fingerprint -> must remain separate singletons (the NULL/short
    # text guard: collapse keys off the shingle set, never raw text)
    rows += [(900, "hello world"), (901, "hello world")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    rep_pairs, members = _cluster_candidates(docs)
    rep_pairs, members = rep_pairs.collect(), members.collect()
    # linear, not quadratic: the pairwise join sees only the 3
    # representatives (1 near-dup edge); replicas ride the member map
    edges = {(r["d1"], r["d2"]) for r in rep_pairs}
    assert edges == {(0, 1)}
    assert len(members) == 3 * k  # every eligible doc mapped, reps incl.
    # star edges = member map minus self-rows
    edges |= {
        (r["rep"], r["doc_id"]) for r in members if r["doc_id"] != r["rep"]
    }
    assert len(edges) == 3 * (k - 1) + 1

    # component check: union-find over the emitted edges
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for d1, d2 in edges:
        parent[find(d1)] = find(d2)
    comp0 = {d for d in parent if find(d) == find(0)}
    # doc 0, doc 1, and all their replicas form ONE component
    assert comp0 == {0, 1} | set(range(100, 100 + 2 * (k - 1)))
    # doc 2's replica clique is its own component
    assert find(2) != find(0)
    # shingle-less docs never appear in the edge list
    assert not ({900, 901} & set(parent))
