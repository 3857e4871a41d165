"""applyInPandasWithState reassembly: streaming-native output must equal
the batch reassembly byte-for-byte."""

import pytest

from mc2skos_spark.plans import schemas
from mc2skos_spark.sources.synth import make_transcript_rows, synth_marc_records
from mc2skos_spark.sources.transcripts import reassemble_records
from mc2skos_spark.streaming.stateful import reassemble_stream

pytestmark = pytest.mark.spark


def test_stateful_stream_reassembly_equals_batch(spark, tmp_path):
    records = synth_marc_records(24, seed=41)
    rows = make_transcript_rows(records, seed=42)
    transcripts = spark.createDataFrame(rows, schema=schemas.TRANSCRIPTS)

    input_dir = str(tmp_path / "in")
    # many small files → turns of one conversation span micro-batches
    transcripts.repartition(10).write.parquet(input_dir)

    stream = (spark.readStream.schema(schemas.TRANSCRIPTS)
              .option("maxFilesPerTrigger", "2")
              .parquet(input_dir))
    out_dir = str(tmp_path / "out")
    query = (reassemble_stream(stream).writeStream
             .format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()

    streamed = {(r["record_id"], r["record_xml"])
                for r in spark.read.parquet(out_dir).collect()}
    batch = {(r["record_id"], r["record_xml"])
             for r in reassemble_records(transcripts).collect()}
    assert streamed == batch
    assert len(streamed) >= 24
