"""The full crawl pipeline — the Ray-native rendering of the
reference's crawl_and_index loop (main.py:69-162), SURVEY.md §3.4:

    frontier ──► J1 left join index_state ──► is_modified filter (S6)
      ──► +host/+shard ──► groupby(shard).map_groups(FrontierShard)
            [URL-seen dedup ∥ robots ∥ priority order ∥ politeness]
      ──► fetch (url ⋈ pages hash join; 404/redirect quarantine)
      ──► ExtractionEngine map_batches (E0, 20 fields)
      ──► write_parquet partitioned by shard  ∥  lineage metrics

Everything streams; the only materialization is the tiny lineage
summary. Checkpoints make the run resumable: killed mid-crawl, a
rerun loads each shard's URL-seen filter and skips already-admitted
urls, converging to the identical final URL-seen set
(tests/test_crawl.py).

In-sandbox fetch resolves bodies from the pages table (hermetic; the
real HTTP fetch actor sits behind the same row contract) with
deterministic fault injection: doc_id % 101 == 0 → 404, % 103 == 0 →
redirect (both skip-continue like the reference, main.py:126-144),
% 97 == 0 → one 429 retry (politeness doubling parity,
fetcher.py:60-66).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..engine import ExtractionEngine
from ..functions.urlnorm import host_hash, host_of
from ..sources.pages import read_pages
from ..state.frontier import FrontierShard
from ..stages.incremental import is_modified_mask, join_index_state
from .extract import CRAWL_TS, corpus_config

_JOIN_PARTITIONS = 16
_DOC_RE = re.compile(r"-(\d+)(?:\?.*)?$")

# Sandbox robots corpus: every host h{n} with n % 10 == 3 disallows
# /docs/ entirely (deterministic, SQL-replicable: doc_id%41 % 10 == 3).
SANDBOX_ROBOTS = {
    f"h{n}.example.org": "User-agent: *\nDisallow: /docs/"
    for n in range(41)
    if n % 10 == 3
}


def _doc_id_of(url: str) -> int:
    m = _DOC_RE.search(url)
    return int(m.group(1)) if m else -1


def sandbox_n_429(url: str) -> int:
    """Deterministic 429 injection: one retry for doc_id % 97 == 0."""
    d = _doc_id_of(url)
    return 1 if d >= 0 and d % 97 == 0 else 0


def fetch_status_of(doc_id: int) -> str:
    if doc_id % 101 == 0:
        return "fetch_error"  # 404 → FetchingError skip
    if doc_id % 103 == 0 and doc_id % 101 != 0:
        return "redirect"  # 301 → AttemptedRedirect skip
    return "fetched"


def scheduled_frontier(
    sf_dir: str,
    num_shards: int = 8,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
    robots_map: dict | None = None,
) -> ray.data.Dataset:
    """Frontier → modified-only → shard shuffle → per-shard schedule.

    Returns every admitted row with status/fetch_order/planned_offset
    (the crawl plan + lineage in one table)."""
    frontier = join_index_state(
        sf_dir, columns=("url", "lastmod", "priority", "site_id", "seq")
    )

    def modified_with_shard(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pa.array(is_modified_mask(batch)))
        shards = pa.array(
            [host_hash(host_of(u)) % num_shards for u in batch["url"].to_pylist()],
            pa.int32(),
        )
        return batch.drop(["last_indexed"]).append_column("shard", shards)

    sharded = frontier.map_batches(modified_with_shard, batch_format="pyarrow")

    robots = SANDBOX_ROBOTS if robots_map is None else robots_map

    def schedule_group(group: pa.Table) -> pa.Table:
        shard_id = int(group["shard"][0].as_py())
        shard = FrontierShard(
            shard_id,
            checkpoint_dir=checkpoint_dir,
            seen_mode=seen_mode,
            robots_map=robots,
        )
        shard.load_checkpoint()
        out = shard.schedule(group, n_429_for=sandbox_n_429)
        shard.checkpoint()
        return out

    # num_partitions == num_shards: one shuffle partition per shard —
    # no empty schemaless partitions (they break downstream joins) and
    # exactly one scheduler invocation per shard.
    return sharded.groupby("shard", num_partitions=num_shards).map_groups(
        schedule_group, batch_format="pyarrow"
    )


_FETCH_INPUT_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("shard", pa.int32()),
        ("seq", pa.int64()),
        ("fetch_order", pa.int64()),
    ]
)


def fetch_stage(scheduled: ray.data.Dataset, sf_dir: str) -> ray.data.Dataset:
    """S5 in-sandbox: resolve page bodies by hash join on url, then
    apply the deterministic fault rules. Production swaps this for an
    HTTP fetch actor pool with the same output columns."""

    def scheduled_only(batch: pa.Table) -> pa.Table:
        # Schema-preserving filter+project: hash-shuffle stages can emit
        # EMPTY schemaless blocks which crash Acero joins downstream —
        # always return a table with the full fetch-input schema.
        if batch.num_rows == 0 or "status" not in batch.column_names:
            return _FETCH_INPUT_SCHEMA.empty_table()
        batch = batch.filter(pc.equal(batch["status"], "scheduled"))
        return batch.select(_FETCH_INPUT_SCHEMA.names).cast(_FETCH_INPUT_SCHEMA)

    to_fetch = scheduled.map_batches(scheduled_only, batch_format="pyarrow")
    pages = read_pages(sf_dir).select_columns(
        ["url", "html", "text", "content_type", "site_id", "doc_id"]
    )
    joined = to_fetch.join(
        pages,
        join_type="left_outer",
        num_partitions=_JOIN_PARTITIONS,
        on=("url",),
    )

    def mark_status(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        status = [
            "missing" if d is None else fetch_status_of(int(d)) for d in doc_ids
        ]
        return batch.append_column("fetch_status", pa.array(status, pa.string()))

    return joined.map_batches(mark_status, batch_format="pyarrow")


class ExtractOrQuarantine:
    """Single-pass extract + quarantine: rows with fetch_status ==
    'fetched' go through the engine; error rows keep their identity
    columns with null output fields. One consumption of the fetch
    join — no operator in this pipeline is ever executed twice (a
    second execution of the *stateful* scheduling stage against its
    own checkpoints would dedup everything away)."""

    def __init__(self, engine: ExtractionEngine):
        self.engine = engine
        self.keep = list(engine.keep_input_columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..engine import arrow_type_for

        ok_mask = pc.equal(batch["fetch_status"], "fetched")
        ok, bad = batch.filter(ok_mask), batch.filter(pc.invert(ok_mask))
        out_ok = self.engine(ok)
        arrays = [bad[c] for c in self.keep] + [
            pa.nulls(bad.num_rows, type=arrow_type_for(f))
            for f in self.engine.config.fields
        ]
        out_bad = pa.table(dict(zip(out_ok.column_names, arrays)))
        return pa.concat_tables([out_ok, out_bad])


def crawl(
    sf_dir: str,
    out_dir: str,
    num_shards: int = 8,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
) -> dict:
    """Full pipeline; returns the lineage/metrics summary.

    Two passes, each consuming its DAG exactly once:
    1. schedule → ``{out_dir}/plan`` Parquet (the persisted crawl
       plan doubles as per-partition lineage; shard checkpoints are
       written as a side effect, once).
    2. plan → fetch join → extract/quarantine →
       ``{out_dir}/docs`` Parquet partitioned by shard (resumable
       layout: one directory per shard).
    Status counts come from the written Parquet (metadata-cheap), not
    from re-executing operators.
    """
    import pyarrow.dataset as pads

    plan_dir = f"{out_dir}/plan"
    docs_dir = f"{out_dir}/docs"

    scheduled_frontier(
        sf_dir, num_shards=num_shards, checkpoint_dir=checkpoint_dir,
        seen_mode=seen_mode,
    ).write_parquet(plan_dir)

    plan_ds = pads.dataset(plan_dir)
    plan_counts: dict[str, int] = {}
    for b in plan_ds.to_table(columns=["status"])["status"].value_counts():
        plan_counts[b["values"].as_py()] = b["counts"].as_py()

    fetch_counts: dict[str, int] = {}
    if plan_counts.get("scheduled", 0) > 0:
        plan = ray.data.read_parquet(plan_dir)
        fetched = fetch_stage(plan, sf_dir)
        engine = ExtractionEngine(
            corpus_config(), crawl_ts=CRAWL_TS,
            keep_input_columns=("url", "shard", "seq", "fetch_status"),
            strict=True,
        )
        fetched.map_batches(
            ExtractOrQuarantine(engine), batch_format="pyarrow", batch_size=1024
        ).write_parquet(docs_dir, partition_cols=["shard"])
        docs = pads.dataset(docs_dir, partitioning="hive")
        for b in docs.to_table(columns=["fetch_status"])[
            "fetch_status"
        ].value_counts():
            fetch_counts[b["values"].as_py()] = b["counts"].as_py()

    return {
        "plan_counts": plan_counts,
        "fetch_counts": fetch_counts,
        "n_extracted": fetch_counts.get("fetched", 0),
        "out_dir": out_dir,
        "checkpoint_dir": checkpoint_dir,
        "num_shards": num_shards,
    }


def crawl_output(sf_dir: str, num_shards: int = 8) -> ray.data.Dataset:
    """The extracted-documents Dataset of a fresh crawl (no
    checkpoint side effects) — used by the oracle-checked query."""
    scheduled = scheduled_frontier(sf_dir, num_shards=num_shards)
    fetched = fetch_stage(scheduled, sf_dir)
    ok = fetched.filter(expr="fetch_status == 'fetched'")
    engine = ExtractionEngine(
        corpus_config(), crawl_ts=CRAWL_TS, keep_input_columns=("url",),
        strict=True,
    )
    return ok.map_batches(engine, batch_format="pyarrow", batch_size=1024)
