"""Custom stateful streaming operator (applyInPandasWithState)."""

from pyspark.sql import functions as F


def test_conversation_state_tracker(spark, transcripts, tmp_path):
    from knowledge_extraction_pipeline_spark.streaming.stream import (
        conversation_state_tracker,
        read_transcript_stream,
    )

    src = str(tmp_path / "state_src")
    sub = transcripts.filter(F.col("conv_id") < "conv000000010")
    sub.repartition(3).write.parquet(src)

    tracked = conversation_state_tracker(read_transcript_stream(spark, src, 1))
    q = (tracked.writeStream.format("memory").queryName("conv_state")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(180)

    # last update per conversation carries the full running totals
    rows = spark.sql("""
        select conv_id, max(n_turns) as n_turns, max(n_entities) as n_entities
        from conv_state group by conv_id""").collect()
    got = {r["conv_id"]: (r["n_turns"], r["n_entities"]) for r in rows}

    from knowledge_extraction_pipeline_spark.operators.extract import mentions
    want_turns = {r["conv_id"]: r["n"] for r in
                  sub.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    want_ents = {r["conv_id"]: r["n"] for r in
                 mentions(sub).groupBy("conv_id")
                 .agg(F.countDistinct("norm_term").alias("n")).collect()}
    assert set(got) == set(want_turns)
    for cid, (nt, ne) in got.items():
        assert nt == want_turns[cid], cid
        assert ne == want_ents[cid], cid
