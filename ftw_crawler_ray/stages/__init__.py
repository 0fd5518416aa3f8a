"""Dataset transform stages: incrementality joins, purge anti-join,
dedup family, text analysis, similarity search, windows, stats."""
