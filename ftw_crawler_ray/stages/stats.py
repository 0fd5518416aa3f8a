"""Per-host / per-partition metrics (A1 analog, scaled).

The reference only counts progress inline (main.py:108). Here
per-host stats use the pre-aggregate pattern: partial counts per
batch inside ``map_batches`` (one row per host per batch), then a
small ``groupby`` over the partials — the shuffle moves O(hosts ×
batches) rows instead of O(pages) (SURVEY.md §2.6, ray_guide
"Aggregation at scale").
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..sources.pages import read_frontier


def host_stats(sf_dir: str) -> ray.data.Dataset:
    frontier = read_frontier(sf_dir).select_columns(["site_id", "seq"])

    def partials(batch: pa.Table) -> pa.Table:
        g = batch.group_by("site_id").aggregate(
            [("seq", "count"), ("seq", "min"), ("seq", "max")]
        )
        # select-by-name before renaming: pyarrow's aggregate output
        # column ORDER is not contractual across versions
        names = {"site_id": "site_id", "seq_count": "n_part",
                 "seq_min": "min_part", "seq_max": "max_part"}
        return g.select(list(names)).rename_columns(list(names.values()))

    agg = (
        frontier.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("site_id")
        .aggregate(
            Sum("n_part", alias_name="n_pages"),
            Min("min_part", alias_name="min_seq"),
            Max("max_part", alias_name="max_seq"),
        )
    )
    return agg
