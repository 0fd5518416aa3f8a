"""Frontier-shard state: URL-seen filters, politeness token buckets,
robots cache, priority heap, checkpointable shard scheduler."""
