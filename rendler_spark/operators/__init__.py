"""Crawl dataflow operators: Bloom seen-set prefilter, politeness budget,
robots gating, first-wins dedup, graph export (SURVEY.md §2)."""
