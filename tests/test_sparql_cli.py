"""SPARQL query CLI (jobs/sparql_query.py): JSON spec → select_query
compilation (paths included), and the subprocess surface over a
persisted triple table."""

import json
import os
import subprocess
import sys

import pytest

from jobs.sparql_query import parse_path, parse_patterns, run_query

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRIPLES = [
    ("a", "broader", "b"), ("b", "broader", "c"),
    ("a", "prefLabel", "Alpha"), ("b", "prefLabel", "Beta"),
    ("c", "prefLabel", "Gamma"),
]


def _t(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string,"
                                          " obj string")


def test_spec_compilation_with_path_and_agg(spark):
    spec = {
        "patterns": [["?x", {"op": "plus", "args": ["broader"]}, "?a"],
                     ["?a", "prefLabel", "?l"]],
        "aggregates": {"n_desc": ["count", None],
                       "first": ["min", "x"]},
        "group_by": ["a", "l"],
        "having": "n_desc >= 1",
        "order_by": ["-n_desc", "a"],
    }
    rows = [tuple(r) for r in run_query(spark, _t(spark), spec).collect()]
    # c has descendants {a, b}; b has {a}
    assert rows == [("c", "Gamma", 2, "a"), ("b", "Beta", 1, "a")]


def test_parse_guards():
    from mc2skos_spark.operators.bgp import Path
    p = parse_path({"op": "seq", "args": [
        "x", {"op": "star", "args": ["y"]}]})
    assert isinstance(p, Path) and p.kind == "seq"
    with pytest.raises(ValueError, match="bad predicate"):
        parse_path({"op": "nope", "args": []})
    with pytest.raises(ValueError, match="3 terms"):
        parse_patterns([["?a", "p"]])


def test_cli_subprocess_plain_parquet(spark, tmp_path):
    _t(spark).write.parquet(str(tmp_path / "triples"))
    spec = {"patterns": [["?c", "broader", "?p"],
                         ["?p", "prefLabel", "?l"]],
            "order_by": ["c"]}
    qpath = tmp_path / "q.json"
    qpath.write_text(json.dumps(spec))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "sparql_query.py"),
         "--warehouse", str(tmp_path / "triples"), "--plain-parquet",
         "--query", str(qpath)],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(x) for x in out.stdout.strip().splitlines()]
    assert lines[-1] == {"rows": 2, "truncated": False}
    assert lines[:-1] == [
        {"c": "a", "p": "b", "l": "Beta"},
        {"c": "b", "p": "c", "l": "Gamma"}]


def test_query_forms_construct_ask_rules(spark):
    assert run_query(spark, _t(spark), {
        "ask": True, "patterns": [["a", "broader", "?p"]],
    }).collect()[0]["ask"] is True
    got = {tuple(r) for r in run_query(spark, _t(spark), {
        "construct": [["?p", "narrower", "?c"]],
        "patterns": [["?c", "broader", "?p"]]}).collect()}
    assert got == {("b", "narrower", "a"), ("c", "narrower", "b")}
    out = run_query(spark, _t(spark), {
        "rules": [[[["?a", "bt", "?b"]], [["?a", "broader", "?b"]]],
                  [[["?a", "bt", "?c"]],
                   [["?a", "bt", "?b"], ["?b", "bt", "?c"]]]]})
    assert {tuple(r) for r in out.collect() if r["pred"] == "bt"} == {
        ("a", "bt", "b"), ("b", "bt", "c"), ("a", "bt", "c")}
