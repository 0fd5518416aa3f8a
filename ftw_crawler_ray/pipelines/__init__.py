"""Pipeline compositions: the flagship extract pipeline and the full
frontier-scheduled crawl."""
