from .pipelines import stream_event_window_counts, stream_extract_images

__all__ = ["stream_extract_images", "stream_event_window_counts"]
