"""Document-metadata canonicalization.

Maps prefixed metadata keys (Dublin-Core etc.) onto canonical names
with first-match precedence — reference metadata.py:1-33, precedence
proven by test_metadata.py:22-26 (dcterms > dc > DC > bare).
"""

from __future__ import annotations

METADATA_MAPPING = {
    "title": ["dcterms:title", "dc:title", "DC.title", "title"],
    "created": ["dcterms:created", "meta:creation-date", "Creation-Date"],
    "description": [
        "dcterms:description",
        "dc:description",
        "DC.description",
        "description",
    ],
    "keywords": ["dc:subject", "DC.subject", "keywords", "subject"],
    "creator": ["dcterms:creator", "dc:creator", "DC.creator", "creator", "author"],
}


def canonicalize_metadata(mapping: dict) -> dict:
    """Return ``mapping`` plus canonical keys resolved by precedence.

    Pure-dict version of the reference's ``SimpleMetadata`` dict
    subclass (metadata.py:12-33); used as a per-row kernel inside the
    extract ``map_batches`` stage over ``map<string,string>`` columns.
    """
    out = dict(mapping)
    for canonical, keys in METADATA_MAPPING.items():
        for possible_key in keys:
            if possible_key in out:
                out[canonical] = out[possible_key]
                break
    return out


class SimpleMetadata(dict):
    """dict subclass with canonicalized keys — same surface as the
    reference class for plugin-compat (metadata.py:12-33)."""

    def __init__(self, mapping):
        super().__init__(canonicalize_metadata(mapping))
