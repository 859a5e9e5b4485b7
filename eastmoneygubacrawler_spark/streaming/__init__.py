from .metrics_stream import crawl_metrics_stream, run_metrics_stream_once  # noqa: F401
