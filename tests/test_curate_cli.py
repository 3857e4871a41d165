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


def test_curate_cli_lm_and_dsir_filters(spark, tmp_path):
    """--max-avg-nll drops the out-of-distribution gibberish doc,
    --dsir-target en then drops the Spanish doc; thresholds are derived
    in-test from the serial references so the test can't drift from the
    operators' exact integer semantics."""
    import hashlib
    import math
    from collections import Counter

    from tests.test_functions import _lm_nll_reference

    texts = {
        1: "the cat and the dog of the house went to the barn in the morning",
        2: "the dog and the cat of the barn went to the house in the evening",
        3: "the bird and the cat of the house went to the barn in the night",
        4: "zqxv wvut plomk jrtds qweaz xcvbn mlopi uytre hgfds zaqwe",
        5: "el perro la casa de que los gatos el dia la noche de que los",
    }
    lang = {1: "en", 2: "en", 3: "en", 4: "und", 5: "es"}

    # LM threshold: midway between the worst wanted doc and the
    # gibberish doc (self-trained over ALL docs — quality gate is open)
    nll = {i + 1: v[2] for i, v in
           _lm_nll_reference([texts[k] for k in sorted(texts)]).items()}
    assert nll[4] > max(nll[k] for k in (1, 2, 3, 5))
    thr = (nll[4] + max(nll[k] for k in (1, 2, 3, 5))) / 2

    # DSIR threshold over the post-LM pool {1,2,3,5}, target = en
    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:2], 16) % 256

    def grams(t):
        tk = t.lower().split()
        return tk + [" ".join(tk[i:i + 2]) for i in range(len(tk) - 1)]

    pool = [1, 2, 3, 5]
    docb = {i: Counter(bucket(g) for g in grams(texts[i])) for i in pool}
    raw, tgt = Counter(), Counter()
    for i in pool:
        for b, c in docb[i].items():
            raw[b] += c
            if lang[i] == "en":
                tgt[b] += c
    rtot, ttot = sum(raw.values()), sum(tgt.values())

    def lp(c, tot):
        return math.floor(math.log((c + 1) / (tot + 256)) * 10000)

    logw = {i: sum(c * (lp(tgt[b], ttot) - lp(raw[b], rtot))
                   for b, c in docb[i].items()) for i in pool}
    assert logw[5] < min(logw[k] for k in (1, 2, 3))
    wthr = (logw[5] + min(logw[k] for k in (1, 2, 3))) // 2

    spark.createDataFrame(sorted(texts.items()),
                          "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--max-avg-nll", str(thr),
         "--dsir-target", "en", "--dsir-min-logw", str(wthr),
         "--jaccard", "0.95", "--capacity", "32"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["stats"] == {
        "input": 5,
        "after_quality_filter": 5,
        "after_lm_filter": 4,       # gibberish doc 4 dropped
        "after_dsir_filter": 3,     # Spanish doc 5 dropped
        "after_exact_dedup": 3,
        "after_near_dedup": 3,
        "output": 3,
    }
    kept = {r["doc_id"]
            for r in spark.read.parquet(result["output"]).collect()}
    assert kept == {1, 2, 3}


def test_train_lm_cli_feeds_curate_lm_gate(spark, tmp_path):
    """jobs/train_lm.py writes the (token, cnt) parquet that
    jobs/curate.py --lm consumes — the full production LM-gate loop
    as two real subprocess invocations."""
    ref = [(i, t) for i, t in enumerate(
        ["the cat and the dog of the house", "the dog and the cat",
         "the bird of the house"])]
    spark.createDataFrame(ref, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "ref"))

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "train_lm.py"),
         "--input", str(tmp_path / "ref"),
         "--output", str(tmp_path / "lm"),
         "--min-count", "2"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    stats = json.loads(out.stdout.strip().splitlines()[-1])
    lm = {r["token"]: r["cnt"]
          for r in spark.read.parquet(str(tmp_path / "lm")).collect()}
    assert lm["the"] == 7 and "bird" not in lm      # cutoff applied
    assert stats["vocab"] == len(lm)
    assert stats["total_tokens"] == sum(lm.values())

    # feed it to the curate gate: the in-distribution doc passes, the
    # gibberish doc is dropped (threshold between ln-floor bands:
    # total=18... actually derive loosely — OOV floor dominates)
    docs = [(1, "the cat and the dog"),
            (2, "zqxv wvut plomk jrtds qweaz")]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))
    import math
    total, vocab = stats["total_tokens"], stats["vocab"]
    oov = -math.floor(math.log(1 / (total + vocab)) * 10000) / 10000
    best = -math.floor(math.log((min(lm.values()) + 1)
                                / (total + vocab)) * 10000) / 10000
    thr = (oov + best) / 2
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "cur"),
         "--max-avg-nll", str(thr), "--lm", str(tmp_path / "lm"),
         "--capacity", "32"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["stats"]["after_lm_filter"] == 1
    kept = {r["doc_id"]
            for r in spark.read.parquet(result["output"]).collect()}
    assert kept == {1}


def test_curate_cli_scrub_spans(spark, tmp_path):
    """--scrub-spans W,D: a boilerplate sentence planted across many
    docs is excised from every one of them before dedup/packing, the
    stats line reports the removed token count, and unique text
    survives byte-for-byte."""
    boiler = ("subscribe to our newsletter for updates and offers "
              "every single week")                       # 11 tokens
    # fully distinct per-doc prefixes: no cross-doc window outside the
    # planted boilerplate, and far below any near-dup threshold
    uniq = [" ".join("w%d%d" % (i, j) for j in range(8))
            for i in range(4)]
    docs = [(i, uniq[i] + " " + boiler) for i in range(4)] \
        + [(9, "completely unrelated standalone document text here")]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--scrub-spans", "4,3",
         "--capacity", "16"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])

    # 4 docs x 11 boilerplate tokens excised; lineage/counters agree
    assert result["stats"]["span_tokens_removed"] == 4 * 11
    assert result["stats"]["input"] == 5
    assert result["stats"]["output"] == 5    # all unique after scrub

    corpus = spark.read.parquet(result["output"]).collect()
    by_id = {r["doc_id"]: r["text"] for r in corpus}
    assert set(by_id) == {0, 1, 2, 3, 9}
    for i in range(4):
        assert by_id[i] == uniq[i]           # boilerplate gone
        assert "newsletter" not in by_id[i]
    assert by_id[9] == docs[4][1]            # untouched doc byte-equal
    # token accounting flows into packing
    assert result["total_tokens"] == sum(len(t.split())
                                         for t in by_id.values())


def test_curate_cli_classifier_gate(spark, tmp_path):
    """--classifier-gate: a fastText-style gate trained IN-TEST on a
    synthetic wiki-vs-spam slice (functions/classifier.py) is saved as
    a JSON weight table and gates the pool through the CLI — spam pool
    docs drop at the classifier stage, lineage counts reflect it, and
    the surviving corpus is exactly the wiki-like docs."""
    from mc2skos_spark.functions.classifier import (save_classifier,
                                                    train_quality_classifier)
    from pyspark.sql import functions as F

    wiki = ["the history of %s is documented in several sources" % w
            for w in ("rome", "cairo", "kyoto", "paris", "lima",
                      "oslo", "quito", "dakar")]
    spam = ["click buy cheap %s now limited offer deal win" % w
            for w in ("pills", "watches", "tickets", "coins", "phones",
                      "rings", "bags", "shoes")]
    train = [(i, t, 1) for i, t in enumerate(wiki[:6])] + \
        [(100 + i, t, 0) for i, t in enumerate(spam[:6])]
    train_df = spark.createDataFrame(
        train, "doc_id long, text string, y int")
    weights, bias_q = train_quality_classifier(
        train_df, F.col("y") == 1, max_iter=50)
    wpath = str(tmp_path / "weights.json")
    save_classifier(wpath, weights, bias_q)

    # held-out pool: 2 wiki (keep) + 2 spam (drop at the gate)
    pool = [(200, wiki[6]), (201, wiki[7]), (210, spam[6]),
            (211, spam[7])]
    spark.createDataFrame(pool, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--classifier-gate", wpath,
         "--jaccard", "0.95", "--capacity", "32"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["stats"] == {
        "input": 4,
        "after_quality_filter": 4,
        "after_classifier_gate": 2,   # both spam docs gated out
        "after_exact_dedup": 2,
        "after_near_dedup": 2,
        "output": 2,
    }
    kept = {r["doc_id"] for r in
            spark.read.parquet(result["output"]).collect()}
    assert kept == {200, 201}


def test_curate_cli_paragraph_dedup(spark, tmp_path):
    """--paragraph-dedup N: repeated passages are removed corpus-wide
    (first occurrence wins), docs losing every paragraph drop from the
    pool, lineage counts reflect the stage, and token accounting flows
    into packing."""
    A = "alpha beta gamma delta"                 # 4-token paragraphs
    B = "echo foxtrot golf hotel"
    C = "india juliet kilo lima"
    docs = [(0, A + " " + B),      # keeps both (first occurrence)
            (1, B + " " + C),      # B lost to doc 0, keeps C
            (2, A + " " + B),      # loses everything -> dropped
            (9, "completely unrelated standalone document text here")]
    spark.createDataFrame(docs, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))

    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--paragraph-dedup", "4",
         "--capacity", "16"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])

    assert result["stats"]["input"] == 4
    assert result["stats"]["after_paragraph_dedup"] == 3
    assert result["stats"]["output"] == 3

    corpus = spark.read.parquet(result["output"]).collect()
    by_id = {r["doc_id"]: r["text"] for r in corpus}
    assert by_id == {0: A + " " + B, 1: C, 9: docs[3][1]}
    assert result["total_tokens"] == sum(len(t.split())
                                         for t in by_id.values())


def test_curate_cli_gopher_gate(spark, tmp_path):
    """--gopher: the Rae-et-al rule bundle as a CLI stage — a
    bullet-list doc and an under-50-words doc drop at the gopher
    stage, a long prose doc survives; lineage counts pin the stage."""
    prose = ("the data to train with and that we have of it . " * 5
             ).strip()
    bullets = prose + ("\n- item" * 10)
    tiny = "the be to of and that have with small doc"
    pool = [(1, prose), (2, bullets), (3, tiny)]
    spark.createDataFrame(pool, "doc_id long, text string") \
        .write.parquet(str(tmp_path / "docs"))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "curate.py"),
         "--input", str(tmp_path / "docs"),
         "--output", str(tmp_path / "out"),
         "--gopher", "--jaccard", "0.95", "--capacity", "64"],
        capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    result = json.loads(out.stdout.strip().splitlines()[-1])
    assert result["stats"]["input"] == 3
    assert result["stats"]["after_gopher_gate"] == 1
    assert result["stats"]["output"] == 1
    kept = {r["doc_id"] for r in
            spark.read.parquet(result["output"]).collect()}
    assert kept == {1}
