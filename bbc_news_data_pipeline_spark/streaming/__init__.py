from .ingest import dedup_links_stream, windowed_event_counts

__all__ = ["dedup_links_stream", "windowed_event_counts"]
