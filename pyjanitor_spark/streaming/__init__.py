from pyjanitor_spark.streaming.verbs import (  # noqa: F401
    STREAMING_SAFE_VERBS,
    configure_state_store,
    foreach_batch_sink,
    running_counter,
    sessionize,
    streaming_dedupe,
    streaming_dedupe_near,
    streaming_quality_filter,
    windowed_agg,
    write_stream_parquet,
)
