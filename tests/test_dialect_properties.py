"""Property-based dialect tests: random values written through INSERT
constructor literals come back exactly through pattern-matched SELECTs
— the statement-level twin of test_adt_properties."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from algebraicdb_spark.engine import Engine

_settings = settings(
    max_examples=10,  # each example runs several Spark jobs
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# exact-in-double integers-over-2 keep the float round-trip bit-exact
_halves = st.integers(-(2**30), 2**30).map(lambda n: n / 2.0)


@given(
    values=st.lists(
        st.one_of(
            st.tuples(st.just("N"), _halves),
            st.tuples(st.just("T"), st.text(alphabet="abcxyz", max_size=6)),
            st.tuples(st.just("U"), st.none()),
        ),
        min_size=1,
        max_size=5,
    )
)
@_settings
def test_insert_pattern_roundtrip(spark, values):
    eng = Engine(spark)
    eng.sql("CREATE TYPE PVal = N(v: Double) | T(s: Text) | U")
    eng.sql("CREATE TABLE prop_vals (id: Integer, p: PVal)")
    tuples = []
    for i, (tag, v) in enumerate(values):
        if tag == "N":
            lit = f"N({v!r})"
        elif tag == "T":
            lit = "T('" + v.replace("'", "''") + "')"
        else:
            lit = "U"
        tuples.append(f"({i}, {lit})")
    eng.sql(f"INSERT INTO prop_vals VALUES {', '.join(tuples)}")

    got_n = {
        (r.id, r.v)
        for r in eng.sql("SELECT id, v FROM prop_vals WHERE p: N(v)").collect()
    }
    got_t = {
        (r.id, r.s)
        for r in eng.sql("SELECT id, s FROM prop_vals WHERE p: T(s)").collect()
    }
    got_u = {
        r.id for r in eng.sql("SELECT id FROM prop_vals WHERE p: U").collect()
    }
    want_n = {(i, v) for i, (t, v) in enumerate(values) if t == "N"}
    want_t = {(i, v) for i, (t, v) in enumerate(values) if t == "T"}
    want_u = {i for i, (t, _) in enumerate(values) if t == "U"}
    assert got_n == want_n
    assert got_t == want_t
    assert got_u == want_u
    eng.sql("DROP TABLE prop_vals")
