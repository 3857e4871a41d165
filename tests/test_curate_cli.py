"""Deployment surface for the corpus-curation pipeline: jobs/curate.py
as a real subprocess invocation (own Spark session, no --py-files —
shiplib auto-ships), verifying every stage's effect in the JSON stats
line and the written corpus."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE = ("the quick brown fox jumps over the lazy dog while the "
        "other dog sleeps near the old barn door today")
BENCH = "held out benchmark question about ancient roman aqueduct design"


def test_curate_cli_end_to_end(spark, tmp_path):
    docs = [
        (1, BASE),                          # keeper of both dup groups
        (2, BASE),                          # exact dup of 1
        (3, BASE + " extraword"),           # near-dup of 1 (not exact)
        (4, "spam spam spam spam spam spam spam spam"),  # Gopher junk
        (5, BENCH),                         # contaminated (copies bench)
        (6, "please email alice@example.org for details about the "
            "offer and respond before friday morning"),  # PII doc
    ]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))
    spark.createDataFrame([(100, BENCH)], "doc_id long, text string") \
        .write.parquet(str(tmp_path / "bench"))

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--benchmark", str(tmp_path / "bench"),
         "--max-top-bigram", "0.5", "--scrub-pii",
         "--capacity", "16"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])

    assert result["stats"] == {
        "input": 6,
        "after_quality_filter": 5,          # junk bigram doc dropped
        "after_contamination_filter": 4,    # benchmark copy dropped
        "after_exact_dedup": 3,             # exact copy dropped
        "after_near_dedup": 2,              # near-dup dropped, min id kept
        "output": 2,
    }
    assert result["n_sequences"] >= 1

    corpus = spark.read.parquet(result["output"]).collect()
    by_id = {r["doc_id"]: r for r in corpus}
    assert set(by_id) == {1, 6}
    assert "[EMAIL]" in by_id[6]["text"]
    assert "alice@example.org" not in by_id[6]["text"]
    # packing invariant: start offsets are the exclusive prefix sum in
    # id order
    rows = sorted(corpus, key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["start_offset"] == acc
        assert r["seq_id"] == acc // 16
        acc += r["n_tokens"]
    # n_sequences is ceil(total_tokens / capacity), not max(seq_id)+1
    assert result["total_tokens"] == acc
    assert result["n_sequences"] == -(-acc // 16)


def test_curate_cli_jsonl_input_and_empty_output(spark, tmp_path):
    """JSONL source format; a corpus that is entirely gated out flows
    through every stage to an empty corpus with zero sequences (no
    crashes on empty aggregates / empty prefix sums)."""
    src = tmp_path / "docs.jsonl"
    with open(src, "w") as fp:
        fp.write('{"doc_id": 1, "text": "spam spam spam spam spam"}\n')
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(src), "--format", "jsonl",
         "--output", str(tmp_path / "out"),
         "--max-top-bigram", "0.5", "--capacity", "16"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["stats"]["input"] == 1
    assert result["stats"]["after_quality_filter"] == 0
    assert result["stats"]["output"] == 0
    assert result["n_sequences"] == 0
    assert result["total_tokens"] == 0


def test_curate_cli_rejects_bad_lsh_params(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", "x", "--output", "y",
         "--num-hashes", "4", "--bands", "8"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode != 0
    assert "LSH banding" in out.stderr


def test_curate_cli_rejects_malformed_rates(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", "x", "--output", "y", "--sample-rates", "en=1.0,"],
        capture_output=True, text=True, timeout=60)
    assert out.returncode != 0
    assert "expected <stratum>=<rate" in out.stderr
