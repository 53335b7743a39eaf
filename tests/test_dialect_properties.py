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


@given(
    values=st.lists(
        st.one_of(
            st.tuples(st.just("WN"), _halves),   # Wrap(N(v))
            st.tuples(st.just("WU"), st.none()),  # Wrap(U)
            st.tuples(st.just("D"), st.none()),   # Detached
        ),
        min_size=1,
        max_size=5,
    )
)
@_settings
def test_nested_insert_pattern_roundtrip(spark, values):
    """Random values written through NESTED constructor literals come
    back exactly through recursive patterns — and the nested variant
    partition is exact (every row matches exactly one pattern)."""
    eng = Engine(spark)
    eng.sql("CREATE TYPE NVal = N(v: Double) | U")
    eng.sql("CREATE TYPE Box = Wrap(inner: NVal) | Detached")
    eng.sql("CREATE TABLE prop_boxes (id: Integer, b: Box)")
    tuples = []
    for i, (tag, v) in enumerate(values):
        if tag == "WN":
            lit = f"Wrap(N({v!r}))"
        elif tag == "WU":
            lit = "Wrap(U)"
        else:
            lit = "Detached"
        tuples.append(f"({i}, {lit})")
    eng.sql(f"INSERT INTO prop_boxes VALUES {', '.join(tuples)}")

    got_wn = {
        (r.id, r.v)
        for r in eng.sql("SELECT id, v FROM prop_boxes WHERE b: Wrap(N(v))").collect()
    }
    got_wu = {
        r.id for r in eng.sql("SELECT id FROM prop_boxes WHERE b: Wrap(U)").collect()
    }
    got_d = {
        r.id for r in eng.sql("SELECT id FROM prop_boxes WHERE b: Detached").collect()
    }
    assert got_wn == {(i, v) for i, (t, v) in enumerate(values) if t == "WN"}
    assert got_wu == {i for i, (t, _) in enumerate(values) if t == "WU"}
    assert got_d == {i for i, (t, _) in enumerate(values) if t == "D"}
    # partition: every row matched exactly one of the three patterns
    assert len(got_wn) + len(got_wu) + len(got_d) == len(values)
    eng.sql("DROP TABLE prop_boxes")


# ---------------------------------------------------------------- macros

_ident = st.from_regex(r"[a-z][a-z0-9_]{0,7}", fullmatch=True)
_arg_expr = st.from_regex(r"[a-z0-9_+\- ]{1,12}", fullmatch=True).map(str.strip).filter(bool)


@given(name=_ident, params=st.lists(_ident, min_size=1, max_size=3, unique=True),
       args=st.data())
@settings(max_examples=50, deadline=None)
def test_macro_expansion_substitutes_each_param(name, params, args):
    """Pure-text property: expanding name(a1, …) of body `p1|p2|…`
    yields every argument parenthesized, in parameter order, and no
    trace of the macro call remains."""
    from algebraicdb_spark.dialect import expand_macros

    # body references every param once, separated by commas
    body = " , ".join(params)
    vals = [args.draw(_arg_expr) for _ in params]
    if name in params:
        return  # a macro named like its own param would self-reference
    sql = f"SELECT {name}({', '.join(vals)}) FROM t"
    out = expand_macros(sql, {name: (params, body)})
    for v in vals:
        assert f"({v})" in out
    assert f"{name}(" not in out


@given(lit=st.text(alphabet="abcdef ()',", max_size=20))
@settings(max_examples=50, deadline=None)
def test_macro_never_rewrites_string_literals(lit):
    from algebraicdb_spark.dialect import expand_macros

    quoted = "'" + lit.replace("'", "''") + "'"
    sql = f"SELECT f(1), {quoted} AS s"
    out = expand_macros(sql, {"f": (["x"], "x + 1")})
    assert quoted in out, "string literal must survive expansion byte-for-byte"
    assert "((1) + 1)" in out


@given(depth=st.integers(min_value=1, max_value=8))
@settings(max_examples=20, deadline=None)
def test_macro_chains_expand_fully_within_cap(depth):
    """A linear chain f1 -> f2 -> … -> fN (N <= 8 < cap 10) must fully
    resolve; the final text contains no macro names."""
    from algebraicdb_spark.dialect import expand_macros

    macros = {}
    for i in range(depth):
        body = f"f{i + 1}(x) + 1" if i + 1 < depth else "x * 2"
        macros[f"f{i}"] = (["x"], body)
    out = expand_macros("SELECT f0(5)", macros)
    for n in macros:
        assert f"{n}(" not in out
    assert "5" in out and "* 2" in out


# ---- fixpoint properties -------------------------------------------------


@given(n=st.integers(2, 25))
@_settings
def test_recursive_series_closed_form(spark, n):
    # UNION-distinct lowering and native UNION ALL agree with the
    # closed form on acyclic generation
    eng = Engine(spark)
    distinct = eng.sql(
        f"WITH RECURSIVE t(k) AS (SELECT 1 UNION "
        f"SELECT k + 1 FROM t WHERE k < {n}) "
        "SELECT CAST(SUM(k) AS BIGINT) AS s FROM t"
    ).collect()[0].s
    native = eng.sql(
        f"WITH RECURSIVE t(k) AS (SELECT 1 UNION ALL "
        f"SELECT k + 1 FROM t WHERE k < {n}) "
        "SELECT CAST(SUM(k) AS BIGINT) AS s FROM t"
    ).collect()[0].s
    assert distinct == native == n * (n + 1) // 2


@given(k=st.integers(1, 8))
@_settings
def test_iterate_bounded_doubling(spark, k):
    got = Engine(spark).sql(
        f"WITH ITERATE g(v) MAX {k} AS (SELECT 1 AS v "
        "STEP SELECT v * 2 AS v FROM g) SELECT MAX(v) AS m FROM g"
    ).collect()[0].m
    assert got == 2**k


@given(
    lit=st.text(alphabet="abc UNIONSTEP().", min_size=1, max_size=20),
)
@_settings
def test_fixpoint_parser_ignores_keywords_in_strings(spark, lit):
    # string literals containing UNION / STEP / parens must not
    # confuse the masked scan; the literal comes back intact
    safe = lit.replace("'", "")
    got = Engine(spark).sql(
        "WITH RECURSIVE t(k, s) AS ("
        f"SELECT 1, '{safe}' UNION "
        f"SELECT k + 1, '{safe}' FROM t WHERE k < 3) "
        "SELECT COUNT(*) AS c, MIN(s) AS s FROM t"
    ).collect()[0]
    assert got.c == 3 and got.s == safe
