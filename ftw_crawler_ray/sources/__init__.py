"""Dataset sources: Parquet pages corpus, sitemap XML parsing,
index-state table, and the deterministic synthetic corpus builders."""
