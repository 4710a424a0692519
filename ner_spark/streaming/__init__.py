from ner_spark.streaming.stream import (  # noqa: F401
    TRANSCRIPTS_SCHEMA,
    run_triples_stream,
    stream_transcripts,
    streaming_new_triples,
    streaming_triples,
    windowed_triple_counts,
)
