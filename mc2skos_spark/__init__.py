"""mc2skos_spark — a PySpark-native knowledge-graph construction engine.

Re-implements, from scratch and Spark-first, the MARC21 Classification /
Authority → SKOS/RDF mapping semantics of scriptotek/mc2skos (reference at
/root/reference, cited per-module as file:line), as staged DataFrame
operators over tables of multi-turn conversation transcripts.

Layout:
    core/       pure-Python semantics (no Spark): MARCXML parse, subfield
                folds, URI minting, triple fan-out, golden-Turtle oracle
    sources/    transcript reassembly (stage 0), synthetic data generators
    operators/  Spark stages: Arrow-batch extraction, canonicalization
                (union-find), SKOS expansion
    functions/  training-data-pipeline operators: dedup, similarity
                search, text analysis, multimodal plumbing
    plans/      staged pipeline with checkpoint/lineage/resume
    sinks/      partitioned triple store (Iceberg-emulated), Turtle, NDJSON
"""

__version__ = "0.1.0"
