"""CQL2 text/JSON parser + compiler unit tests."""

import pytest

from rustac_spark.stac.cql2 import (
    Cql2Error, Lit, Op, Prop, compile_filter, parse, parse_text, properties,
)


def test_parse_comparison():
    ast = parse_text("sat:relative_orbit = 98")
    assert isinstance(ast, Op) and ast.op == "="
    assert ast.args[0].name == "sat:relative_orbit"
    assert ast.args[1].value == 98


def test_parse_precedence():
    ast = parse_text("a = 1 or b = 2 and c = 3")
    assert ast.op == "or"
    assert ast.args[1].op == "and"


def test_parse_not_and_parens():
    ast = parse_text("not (a = 1 or b = 2)")
    assert ast.op == "not" and ast.args[0].op == "or"


def test_parse_in_like_between_null():
    assert parse_text("a in (1, 2, 3)").op == "in"
    assert parse_text("a like 'foo%'").op == "like"
    assert parse_text("a between 1 and 5").op == "between"
    assert parse_text("a is null").op == "isNull"
    ast = parse_text("a is not null")
    assert ast.op == "not" and ast.args[0].op == "isNull"
    ast = parse_text("a not in (1)")
    assert ast.op == "not" and ast.args[0].op == "in"


def test_parse_casei_and_strings():
    ast = parse_text("casei(name) = 'it''s'")
    assert ast.args[0].op == "casei"
    assert ast.args[1].value == "it's"


def test_parse_timestamp():
    ast = parse_text("datetime >= timestamp('2024-01-01T00:00:00Z')")
    assert ast.args[1].value.year == 2024


def test_parse_json():
    ast = parse({"op": "and", "args": [
        {"op": "=", "args": [{"property": "collection"}, "c1"]},
        {"op": ">", "args": [{"property": "eo:cloud_cover"}, 50]},
    ]})
    assert ast.op == "and"
    assert properties(ast) == {"collection", "eo:cloud_cover"}


def test_properties_collection():
    assert properties(parse_text("a = 1 and b in (2,3) or not c is null")) \
        == {"a", "b", "c"}


def test_compile_short_circuit(spark):
    col, short = compile_filter("nope = 1", ["id", "collection"])
    assert short and col is None
    col, short = compile_filter("id = 'x'", ["id", "collection"])
    assert not short and col is not None


def test_bad_input():
    with pytest.raises(Cql2Error):
        parse_text("a = ")
    with pytest.raises(Cql2Error):
        parse_text("a ~ 1")
    with pytest.raises(Cql2Error):
        parse({"op": "weird", "args": []})
