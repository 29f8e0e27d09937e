"""Frontier subsystem: crawl loop, seen-set filtering, politeness,
checkpointing. See crawler.Crawler for the entry point."""

from .crawler import Crawler, CrawlConfig  # noqa: F401
from .checkpoint import CrawlStore  # noqa: F401
