"""Deployment surface for the persisted dedup index: jobs/dedup_index.py
create + ingest as real subprocess invocations (own Spark session, no
--py-files — shiplib auto-ships), verifying the JSON stats line and the
cross-invocation persistence: ingest reads the index the create
process committed."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=240):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_index.py")]
        + args, capture_output=True, text=True, timeout=timeout)
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_create_then_ingest_cli(spark, tmp_path):
    corpus = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
              (2, "one two three four five six seven eight nine")]
    batch = [(11, "alpha beta gamma delta epsilon zeta eta theta"),
             (12, "totally novel text with no duplicate anywhere here")]
    spark.createDataFrame(corpus, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(batch, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "batch"))

    wh = str(tmp_path / "wh")
    created = _run(["create", "--input", str(tmp_path / "corpus"),
                    "--warehouse", wh, "--n", "2",
                    "--num-hashes", "16", "--bands", "4"])
    assert created["indexed_docs"] == 2
    assert created["bucket_rows"] == 2 * 4
    assert created["params"]["minhash_bands"] == 4

    ingested = _run(["ingest", "--input", str(tmp_path / "batch"),
                     "--warehouse", wh,
                     "--pairs-out", str(tmp_path / "pairs")])
    assert ingested["pairs"] == 1          # 11 duplicates corpus doc 1
    assert ingested["committed"] is True
    assert ingested["index_rows"] == 4 * 4  # (2+2 docs) x 4 bands

    rows = {(r["id_a"], r["id_b"])
            for r in spark.read.parquet(
                str(tmp_path / "pairs")).collect()}
    assert rows == {(1, 11)}


def test_ingest_with_keepers_cli(spark, tmp_path):
    corpus = [(1, "alpha beta gamma delta epsilon zeta eta theta")]
    batch = [(11, "alpha beta gamma delta epsilon zeta eta theta"),
             (12, "totally novel text with no duplicate anywhere here")]
    spark.createDataFrame(corpus, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "corpus"))
    spark.createDataFrame(batch, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "batch"))
    wh = str(tmp_path / "wh")
    _run(["create", "--input", str(tmp_path / "corpus"),
          "--warehouse", wh, "--n", "2", "--num-hashes", "16",
          "--bands", "4"])
    # seed the keeper state for the corpus, then the real batch
    _run(["ingest", "--input", str(tmp_path / "corpus"),
          "--warehouse", wh, "--assign-keepers", "--batch-id", "0",
          "--no-commit"])  # corpus already indexed by create
    got = _run(["ingest", "--input", str(tmp_path / "batch"),
                "--warehouse", wh, "--assign-keepers",
                "--batch-id", "1"])
    assert got["batch_docs"] == 2
    assert got["batch_dups"] == 1  # 11 collapses onto corpus doc 1


def test_maintain_cli_compacts_and_preserves_answers(spark, tmp_path):
    """maintain: after several appends the index tables compact to one
    snapshot dir each (fewer files, identical rows), old snapshots are
    expired, and a subsequent ingest still answers exactly as before —
    the maintenance action must be invisible to the dedup semantics."""
    corpus = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
              (2, "one two three four five six seven eight nine")]
    b1 = [(11, "unique first batch text nothing shared at all")]
    b2 = [(21, "second batch also fully unique content rows")]
    probe = [(31, "alpha beta gamma delta epsilon zeta eta theta")]
    for name, rows in (("corpus", corpus), ("b1", b1), ("b2", b2),
                       ("probe", probe)):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .write.parquet(str(tmp_path / name))

    wh = str(tmp_path / "wh")
    _run(["create", "--input", str(tmp_path / "corpus"),
          "--warehouse", wh, "--n", "2", "--num-hashes", "16",
          "--bands", "4"])
    _run(["ingest", "--input", str(tmp_path / "b1"), "--warehouse", wh,
          "--batch-id", "1"])
    _run(["ingest", "--input", str(tmp_path / "b2"), "--warehouse", wh,
          "--batch-id", "2"])

    maintained = _run(["maintain", "--warehouse", wh])
    tables = maintained["tables"]
    assert tables, "maintain saw no tables"
    for t, st in tables.items():
        assert st["files_after"] <= st["files_before"], t
        assert st["dirs_removed"] >= 1, t       # old snapshots expired
    # the compacted index still answers identically
    got = _run(["ingest", "--input", str(tmp_path / "probe"),
                "--warehouse", wh, "--batch-id", "3",
                "--pairs-out", str(tmp_path / "pairs")])
    assert got["pairs"] == 1
    rows = {(r["id_a"], r["id_b"]) for r in
            spark.read.parquet(str(tmp_path / "pairs")).collect()}
    assert rows == {(1, 31)}
    assert got["index_rows"] == 5 * 4           # 5 docs x 4 bands
