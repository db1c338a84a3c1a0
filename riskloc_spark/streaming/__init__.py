from riskloc_spark.streaming.pipeline import (  # noqa: F401
    dedup_events_stream,
    events_stream,
    ewma_anomaly_stream,
    rca_foreach_batch,
    windowed_kpi_stream,
)
