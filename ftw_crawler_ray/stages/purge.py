"""Purge: indexed docs that vanished from every sitemap (J2).

Reference semantics (purging.py:8-30): purge a previously-indexed doc
iff its url starts with the site's url AND the url is in no sitemap
of the site — membership tested case-insensitively
(sitemap.py:200-204). The reference is an O(docs × urls) scan; here
it is a hash-partitioned LEFT ANTI join on ``lower(url)``.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..sources.pages import read_frontier, read_index_state

_JOIN_PARTITIONS = 16
# "url starts with some site's url" — sites are http://h{n}.example.org/
_SITE_PREFIX = re.compile(r"^http://h[0-9]+\.example\.org/")


def _with_lower_url(ds: ray.data.Dataset) -> ray.data.Dataset:
    return ds.map_batches(
        lambda t: t.append_column("url_lower", pc.utf8_lower(t["url"])),
        batch_format="pyarrow",
    )


def purge_candidates(sf_dir: str, site_prefix: re.Pattern = _SITE_PREFIX):
    """index_state ANTI JOIN frontier on lower(url), scoped to urls
    under a configured site prefix → (uid, url) tombstones."""
    index_state = _with_lower_url(
        read_index_state(sf_dir).select_columns(["uid", "url"])
    )
    frontier_urls = _with_lower_url(
        read_frontier(sf_dir).select_columns(["url"])
    ).select_columns(["url_lower"])

    gone = index_state.join(
        frontier_urls,
        join_type="left_anti",
        num_partitions=_JOIN_PARTITIONS,
        on=("url_lower",),
    )

    def scope_to_sites(batch: pa.Table) -> pa.Table:
        keep = pa.array(
            [bool(site_prefix.match(u)) for u in batch["url"].to_pylist()]
        )
        return batch.filter(keep).select(["uid", "url"])

    return gone.map_batches(scope_to_sites, batch_format="pyarrow", batch_size=None)
