from .crawl import CrawlConfig, run_crawl  # noqa: F401
