"""GraphQL document executor: parser + execution semantics against a
stub resolver set (no Spark involved — this is the transport layer).

Shapes mirror what gqlgen accepts for the reference schema
(app/rest/graph/schema.graphqls): multi-field documents, aliases,
nested selections, fragments, variables, @skip/@include."""

from __future__ import annotations

import pytest

from evm_indexer_spark.errors import NotFoundError, ValidationError
from evm_indexer_spark.gqlexec import (
    GraphQLExecutionError,
    GraphQLExecutor,
    parse_document,
)


class StubResolvers:
    def block_by_number(self, number):
        if number == "404":
            raise NotFoundError()
        if not number.isdigit():
            raise ValidationError("Bad Block Number")
        return {
            "hash": f"0x{int(number):064x}",
            "number": number,
            "miner": "0x" + "ab" * 21,
            "gasUsed": "21000",
        }

    def blocks_by_number_range(self, frm, to):
        return [self.block_by_number(str(n)) for n in range(int(frm), int(to) + 1)]

    def transaction_count_between_accounts_by_number_range(self, fa, ta, frm, to):
        return len(fa) + len(ta) + int(frm) + int(to)

    def nested_thing(self):
        return {"outer": {"inner": {"leaf": 7, "extra": 8}, "also": 1}}


@pytest.fixture()
def ex():
    return GraphQLExecutor(StubResolvers())


def test_single_field_flat_selection(ex):
    out = ex.execute('{ blockByNumber(number: "3") { hash number } }')
    assert out == {
        "data": {
            "blockByNumber": {"hash": f"0x{3:064x}", "number": "3"}
        }
    }


def test_two_fields_with_variables(ex):
    doc = """
    query Two($n: String!, $f: String! = "0", $t: String!) {
      one: blockByNumber(number: $n) { number }
      blocksByNumberRange(from: $f, to: $t) { number }
    }
    """
    out = ex.execute(doc, variables={"n": "5", "t": "2"})
    assert out["data"]["one"] == {"number": "5"}
    assert [b["number"] for b in out["data"]["blocksByNumberRange"]] == [
        "0", "1", "2",
    ]
    assert "errors" not in out


def test_missing_required_variable(ex):
    out = ex.execute(
        "query Q($n: String!) { blockByNumber(number: $n) { number } }"
    )
    assert "was not provided" in out["errors"][0]["message"]


def test_named_fragment_and_alias(ex):
    doc = """
    query {
      b: blockByNumber(number: "1") { ...blockBits }
    }
    fragment blockBits on Block { hash gasUsed }
    """
    out = ex.execute(doc)
    assert set(out["data"]["b"]) == {"hash", "gasUsed"}


def test_inline_fragment_and_typename(ex):
    doc = """
    {
      blockByNumber(number: "1") {
        __typename
        ... on Block { number }
      }
    }
    """
    out = ex.execute(doc)
    assert out["data"]["blockByNumber"] == {
        "__typename": "Block",
        "number": "1",
    }


def test_root_typename(ex):
    assert ex.execute("{ __typename }") == {"data": {"__typename": "Query"}}


def test_skip_include_directives(ex):
    doc = """
    query Q($yes: Boolean!, $no: Boolean!) {
      blockByNumber(number: "1") {
        number @include(if: $yes)
        hash @include(if: $no)
        gasUsed @skip(if: $yes)
        miner @skip(if: $no)
      }
    }
    """
    out = ex.execute(doc, variables={"yes": True, "no": False})
    assert set(out["data"]["blockByNumber"]) == {"number", "miner"}


def test_nested_selection_sets(ex):
    out = ex.execute("{ nestedThing { outer { inner { leaf } } } }")
    assert out["data"]["nestedThing"] == {
        "outer": {"inner": {"leaf": 7}}
    }


def test_multi_operation_requires_name(ex):
    doc = """
    query A { blockByNumber(number: "1") { number } }
    query B { blockByNumber(number: "2") { number } }
    """
    out = ex.execute(doc)
    assert "operationName" in out["errors"][0]["message"]
    out = ex.execute(doc, operation_name="B")
    assert out["data"]["blockByNumber"]["number"] == "2"


def test_mutation_rejected(ex):
    out = ex.execute("mutation { blockByNumber(number: \"1\") { hash } }")
    assert "unsupported operation" in out["errors"][0]["message"]


def test_field_error_yields_null_and_error_entry(ex):
    doc = """
    {
      ok: blockByNumber(number: "1") { number }
      bad: blockByNumber(number: "zzz") { number }
    }
    """
    out = ex.execute(doc)
    assert out["data"]["ok"] == {"number": "1"}
    assert out["data"]["bad"] is None
    assert out["errors"][0]["path"] == ["bad"]


def test_between_accounts_arg_aliasing(ex):
    doc = """
    {
      transactionCountBetweenAccountsByNumberRange(
        fromAccount: "ab", toAccount: "cde", from: "1", to: "2")
    }
    """
    out = ex.execute(doc)
    assert out["data"]["transactionCountBetweenAccountsByNumberRange"] == 8


def test_fragment_cycle_detected(ex):
    doc = """
    { blockByNumber(number: "1") { ...a } }
    fragment a on Block { ...b }
    fragment b on Block { ...a }
    """
    out = ex.execute(doc)
    assert "cycle" in out["errors"][0]["message"]


def test_unknown_fragment(ex):
    out = ex.execute('{ blockByNumber(number: "1") { ...nope } }')
    assert "unknown fragment" in out["errors"][0]["message"]


def test_parse_errors_are_envelopes(ex):
    for bad in ["{", "", "{ }", "query ($x: Int) {{", "{ f(a:) }"]:
        out = ex.execute(bad)
        assert "errors" in out and "data" not in out


def test_value_grammar():
    doc = parse_document(
        'query Q($v: Int) { f(a: 1, b: -2.5e3, c: "s\\n", d: [1, 2], '
        "e: {x: true, y: null, z: ENUMVAL}, g: $v) }"
    )
    args = doc["operations"][0]["selections"][0]["args"]
    assert args["a"]["value"] == 1
    assert args["b"]["value"] == -2500.0
    assert args["c"]["value"] == "s\n"
    assert [i["value"] for i in args["d"]["items"]] == [1, 2]
    assert args["e"]["fields"]["z"]["value"] == "ENUMVAL"
    assert args["g"] == {"kind": "variable", "name": "v"}


def test_block_string_and_comments():
    doc = parse_document(
        '# leading comment\n{ f(a: """multi\nline""") } # trailing'
    )
    assert doc["operations"][0]["selections"][0]["args"]["a"]["value"] == (
        "multi\nline"
    )


def test_empty_selection_set_rejected():
    with pytest.raises(GraphQLExecutionError):
        parse_document("{ f { } }")


def test_parser_total_on_arbitrary_input():
    """The transport parser must be total: any input either parses or
    raises GraphQLExecutionError — never an unhandled exception (a
    public endpoint sees arbitrary bytes)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=200))
    def run(src):
        try:
            parse_document(src)
        except GraphQLExecutionError:
            pass

    run()


def test_executor_total_on_arbitrary_documents(ex):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.text(max_size=120))
    def run(src):
        out = ex.execute(src)
        assert isinstance(out, dict) and ("data" in out or "errors" in out)

    run()


def test_every_field_map_key_resolves_end_to_end():
    """Every schema field in graphql.FIELD_MAP must route to its resolver
    through the executor — including names _camel_to_snake mis-splits
    (lastXEventsFromContract). Stub resolvers are generated with the REAL
    resolver signatures so argument wiring is exercised too."""
    import inspect

    from evm_indexer_spark import graphql as g

    reverse_alias = {"frm": "from", "fa": "fromAccount", "ta": "toAccount"}

    class AllFields:
        def __init__(self):
            self.calls = []

    for field, method in g.FIELD_MAP.items():
        real = getattr(g.GraphQLResolvers, method)
        params = [
            p for p in inspect.signature(real).parameters if p != "self"
        ]
        is_count = "count" in method
        body = "self.calls.append(%r); return %s" % (
            method, "7" if is_count else "{'hash': '0x1'}"
        )
        src = "def f(self%s): %s" % (
            "".join(", " + p for p in params), body
        )
        ns: dict = {}
        exec(src, ns)  # noqa: S102 — test-only stub generation
        setattr(AllFields, method, ns["f"])

    stub = AllFields()
    ex = GraphQLExecutor(stub)
    for field, method in g.FIELD_MAP.items():
        real = getattr(g.GraphQLResolvers, method)
        params = [
            p for p in inspect.signature(real).parameters if p != "self"
        ]
        args = []
        for p in params:
            name = reverse_alias.get(p, p)
            val = '["0x0"]' if p == "topics" else '"1"'
            args.append(f"{name}: {val}")
        arg_src = "(" + ", ".join(args) + ")" if args else ""
        sel = "" if "count" in method else " { hash }"
        out = ex.execute("{ %s%s%s }" % (field, arg_src, sel))
        assert "errors" not in out, (field, out)
        expected = 7 if "count" in method else {"hash": "0x1"}
        assert out["data"][field] == expected, field
        assert stub.calls[-1] == method


def test_unexpected_resolver_exception_becomes_internal_error():
    """gqlgen recovers resolver panics into a generic envelope entry;
    arbitrary Python exceptions (Py4J analysis errors, model bugs) must
    do the same instead of escaping to the HTTP layer."""

    class Boom:
        def block_by_number(self, number):
            raise RuntimeError("py4j exploded")

    out = GraphQLExecutor(Boom()).execute(
        '{ blockByNumber(number: "1") { hash } }'
    )
    assert out["data"]["blockByNumber"] is None
    assert out["errors"] == [
        {"message": "internal system error", "path": ["blockByNumber"]}
    ]
