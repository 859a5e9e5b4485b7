from .generator import FixtureConfig, build_corpus, write_corpus  # noqa: F401
from .simulator import simulate_reference_crawl  # noqa: F401
