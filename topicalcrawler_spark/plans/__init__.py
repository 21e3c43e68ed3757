"""Crawl plans: round loop, init, resume, lineage."""
