"""ftw_crawler_ray — a Ray-Data-native crawl/data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of 4teamwork/ftw.crawler (reference at /root/reference/)
on top of ``ray.data.Dataset`` pipelines: zero-copy Arrow batches,
``map_batches`` transform stages, actor pools for stateful stages
(URL frontier shards, fetchers), explicit partitioning by
canonical-host hash, and Parquet checkpoints for exact resume.

This is NOT a port: the reference is a single-threaded sequential
sitemap-walk loop (reference main.py:75,107-113); here every stage is
a streaming Dataset transform designed for multi-node scale.
"""

__version__ = "0.1.0"
