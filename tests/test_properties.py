"""Property-based tests (SURVEY.md §5.3): parser/encoder laws the
reference only enforced by convention.  Hypothesis drives small input
batches through real Spark plans — few examples, each vectorized."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from real___time_fraud_detection_using_apache_kafka_spark.functions.scalar import (
    currency_format,
    currency_parse,
    normalize_key,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.dedup import (
    exact_dedup,
)
from real___time_fraud_detection_using_apache_kafka_spark.operators.temporal import (
    sessionize,
)

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

amounts = st.lists(
    st.floats(min_value=0.0, max_value=1e9, allow_nan=False, allow_infinity=False),
    min_size=1, max_size=50,
)


@given(xs=amounts)
@SET
def test_currency_roundtrip_law(spark, xs):
    """F7+F8: parse(format(x)) == round(x, 2) — the evaluation module's
    money path loses nothing beyond cents truncation."""
    df = spark.createDataFrame([(x,) for x in xs], ["x"])
    out = df.select(
        F.round("x", 2).alias("want"),
        currency_parse(currency_format(F.col("x"))).alias("got"),
    ).collect()
    for r in out:
        assert abs(r["want"] - r["got"]) < 1e-9


@given(
    keys=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Zs")),
            min_size=1, max_size=20,
        ),
        min_size=1, max_size=30,
    )
)
@SET
def test_normalize_key_idempotent(spark, keys):
    """S7: normalize(normalize(k)) == normalize(k)."""
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    out = df.select(
        normalize_key(F.col("k")).alias("once"),
        normalize_key(normalize_key(F.col("k"))).alias("twice"),
    ).collect()
    for r in out:
        assert r["once"] == r["twice"]


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)),
        min_size=1, max_size=60,
    )
)
@SET
def test_exact_dedup_idempotent_and_set_semantics(spark, rows):
    """D1: dedup(dedup(df)) == dedup(df) == distinct set of rows."""
    df = spark.createDataFrame(rows, ["a", "b"])
    once = exact_dedup(df)
    assert once.count() == len(set(rows))
    assert exact_dedup(once).count() == once.count()


@given(deltas=st.lists(st.integers(1, 7200), min_size=1, max_size=40))
@SET
def test_sessionize_invariants(spark, deltas):
    """Sessions: ids are 0-based and contiguous per key; row count is
    preserved; a gap > threshold always starts a new session."""
    ts, acc = [], 0
    for d in deltas:
        acc += d
        ts.append(acc)
    df = spark.createDataFrame([(1, float(t)) for t in ts], ["k", "t"])
    s = sessionize(
        df.select("k", F.timestamp_seconds("t").alias("t")), ["k"], "t",
        gap="30 minutes",
    )
    rows = sorted(s.collect(), key=lambda r: r["t"])
    assert len(rows) == len(ts)
    ids = [r["session_id"] for r in rows]
    assert ids[0] == 0
    for prev, cur in zip(ids, ids[1:]):
        assert cur in (prev, prev + 1)
    n_gaps = sum(1 for d in deltas[1:] if d > 1800)
    assert ids[-1] == n_gaps


def test_currency_parse_lenient_on_malformed(spark):
    """F13 contract under ANSI mode (Spark 4 default): malformed money
    strings null out instead of throwing mid-job."""
    df = spark.createDataFrame(
        [("$12.50",), ("$N/A",), ("",), ("garbage",)], ["s"]
    )
    got = [r["v"] for r in df.select(currency_parse(F.col("s")).alias("v")).collect()]
    assert got == [12.5, None, None, None]


@given(
    n_tokens=st.lists(st.integers(min_value=1, max_value=60),
                      min_size=1, max_size=12)
)
@SET
def test_chunking_covers_every_token_with_fixed_overlap(spark, n_tokens):
    """doc_chunks_overlap laws: every token index appears in >= 1 chunk
    (no data loss), chunk starts advance by exactly the stride, and no
    chunk is fully contained in its predecessor."""
    import real___time_fraud_detection_using_apache_kafka_spark.plans.queries_text as QT

    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)), "en", "s", 0)
        for i, n in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    orig = QT.load_table
    QT.load_table = lambda sp, sf, name: df  # noqa: ARG005
    try:
        rows = QT.doc_chunks_overlap(spark, "unused").collect()
    finally:
        QT.load_table = orig
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for (i, text, *_rest) in docs:
        toks = text.split()
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_id"])
        seen = set()
        for c in chunks:
            seen.update(c["chunk_text"].split())
        assert seen == set(toks)  # total coverage
        # stride law: chunk k starts at 12k; its text matches the slice
        for k, c in enumerate(chunks):
            assert c["chunk_text"].split() == toks[12 * k: 12 * k + 16]


@given(
    xs=st.lists(
        st.floats(min_value=0.01, max_value=1e6,
                  allow_nan=False, allow_infinity=False),
        min_size=2, max_size=40,
    ),
    scale=st.floats(min_value=0.1, max_value=100.0,
                    allow_nan=False, allow_infinity=False),
)
@SET
def test_gini_scale_invariance_and_bounds(spark, xs, scale):
    """Gini laws: invariant under positive scaling, bounded [0, 1),
    zero iff all values equal — driven through the same grouped-agg
    pandas UDAF the catalog query uses."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    import numpy as np

    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def gini(x):
        v = np.sort(x.to_numpy(dtype="float64"))
        n = v.size
        i = np.arange(1, n + 1, dtype="float64")
        return float(((2.0 * i - n - 1) * v).sum() / (n * v.sum()))

    rows = [(0, x) for x in xs] + [(1, x * scale) for x in xs]
    df = spark.createDataFrame(rows, "g int, x double")
    got = {r["g"]: r["gv"] for r in
           df.groupBy("g").agg(gini("x").alias("gv")).collect()}
    assert abs(got[0] - got[1]) < 1e-9          # scale invariance
    assert -1e-12 <= got[0] < 1.0               # bounds
    if len(set(xs)) == 1:
        assert abs(got[0]) < 1e-12              # equality -> 0


@given(
    cents=st.lists(st.integers(min_value=1, max_value=10**12),
                   min_size=1, max_size=40),
)
@SET
def test_benford_digit_extraction_matches_decimal_repr(spark, cents):
    """The arithmetic first-digit extraction (cents -> BIGINT -> first
    char) agrees with the decimal representation of the amount for any
    positive 2-decimal value — the law that makes the Benford audit
    engine-portable."""
    df = spark.createDataFrame([(c / 100.0,) for c in cents], ["p"])
    got = df.select(
        "p",
        F.substring(F.round(F.col("p") * 100).cast("long").cast("string"), 1, 1)
        .alias("digit"),
    ).collect()
    for r in got:
        assert r["digit"] == next(c for c in f"{r['p']:.2f}" if c not in "0."), r
