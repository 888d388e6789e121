from stac_to_geocore_spark.streaming.events import (
    sessionize_stream,
    stream_events_from_dir,
    windowed_event_counts,
)

__all__ = ["stream_events_from_dir", "windowed_event_counts", "sessionize_stream"]
