from .crawl import CrawlConfig, run_crawl  # noqa: F401
from .purge import purge_urls  # noqa: F401
