"""The full crawl pipeline — the Ray-native rendering of the
reference's crawl_and_index loop (main.py:69-162), SURVEY.md §3.4:

    frontier ∪ index_state ──► ONE host-hash shard shuffle
      ──► groupby(shard).map_groups(FrontierShard)
            [J1 lookup ∥ is_modified (S6) ∥ URL-seen dedup ∥ robots
             ∥ priority order ∥ politeness ∥ checkpoint]
      ──► plan Parquet (lineage)
      ──► FetchActor pool (S5; 404/redirect/missing quarantine)
      ──► ExtractionEngine map_batches (E0, 20 fields)
      ──► write_parquet partitioned by shard
      ∥    purge anti-join → tombstones  ∥  index-state update
      ∥    per-shard metrics from checkpoints

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

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.util import sized_read_parquet

from ..engine import ExtractionEngine
from ..functions.urlnorm import host_hash
from ..sources.pages import (
    _documents,
    frontier_batch,
    index_state_batch,
    read_pages,
)
from ..state.frontier import FrontierShard
from ..stages.incremental import is_modified_mask
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


def _shard_column(site_ids: pa.Array, num_shards: int) -> pa.Array:
    """shard = host_hash(host) % num_shards, hashed once per distinct
    host (hosts repeat heavily) — the single partitioning key the
    whole crawl reuses (SURVEY.md §7.3)."""
    enc = pc.dictionary_encode(site_ids.combine_chunks())
    unique_shards = np.array(
        [host_hash(h) % num_shards for h in enc.dictionary.to_pylist()],
        dtype=np.int32,
    )
    return pa.array(
        unique_shards[enc.indices.to_numpy(zero_copy_only=False)], pa.int32()
    )


_PLAN_INPUT_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),  # 'f' frontier | 'i' index_state
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("priority", pa.string()),
        ("site_id", pa.string()),
        ("seq", pa.int64()),
        ("last_modified", pa.timestamp("us")),
        ("shard", pa.int32()),
    ]
)


# hosts that belong to configured sites (purge scope: a vanished url
# is purged only when it lives under a site we crawl — reference
# purging.py:21-24 `url.startswith(site.url)`)
SANDBOX_SITE_HOSTS = frozenset(f"h{n}.example.org" for n in range(41))


# scheduling chunk: bounds the scheduler's own working set when one
# shard's group is huge; ordering/politeness then apply per chunk
# (matches the reference's arrival-order semantics; oracle-scale
# groups are far below this, so oracle exactness is unaffected)
SCHEDULE_CHUNK_ROWS = 500_000


def _frontier_side_table(batch: pa.Table, num_shards: int) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "kind": pa.array(["f"] * n, pa.string()),
            "url": batch["url"],
            "lastmod": batch["lastmod"],
            "priority": batch["priority"],
            "site_id": batch["site_id"],
            "seq": batch["seq"],
            "last_modified": pa.nulls(n, pa.timestamp("us")),
            "shard": _shard_column(batch["site_id"], num_shards),
        },
        schema=_PLAN_INPUT_SCHEMA,
    )


def _index_side_table(batch: pa.Table, num_shards: int) -> pa.Table:
    n = batch.num_rows
    return pa.table(
        {
            "kind": pa.array(["i"] * n, pa.string()),
            "url": batch["url"],
            "lastmod": pa.nulls(n, pa.string()),
            "priority": pa.nulls(n, pa.string()),
            "site_id": batch["crawler_site_id"],
            "seq": pa.nulls(n, pa.int64()),
            "last_modified": batch["last_modified"],
            "shard": _shard_column(batch["crawler_site_id"], num_shards),
        },
        schema=_PLAN_INPUT_SCHEMA,
    )


def scheduled_frontier(
    sf_dir: str,
    num_shards: int | None = 8,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
    robots_map: dict | None = None,
    replicate: int = 1,
    emit_purge: bool = False,
    site_hosts: frozenset | None = None,
    run_id: str | None = None,
    force: bool = False,
) -> ray.data.Dataset:
    """Frontier ∪ index_state → ONE host-hash shard shuffle →
    per-shard (J1 lookup + is_modified + dedup/robots/order/politeness
    [+ J2 purge candidates]).

    Both inputs are co-partitioned on the same canonical-host shard
    key, so the last-indexed lookup (J1) happens inside the shard
    group instead of a separate hash-join shuffle — one all-to-all
    for the whole scheduling stage instead of two. With
    ``emit_purge=True`` the same shuffle also yields J2: the shard
    owns every sitemap url of its hosts, so an index row whose
    lower(url) appears in none of them is a purge candidate
    (status='purge') — the anti-join costs no extra exchange.
    Returns every admitted row with status/fetch_order/planned_offset
    (the crawl plan + lineage in one table).

    ``num_shards=None`` sizes the shard count from the input row
    count (auto_num_shards: ~2.5M urls/shard, the 4k-shards-at-10^10
    rule as code).
    """
    if num_shards is None:
        import pyarrow.parquet as pqm

        n_docs = pqm.ParquetFile(
            f"{sf_dir}/documents.parquet"
        ).metadata.num_rows
        # frontier + index_state both ride the shuffle
        from ..state.frontier import auto_num_shards

        num_shards = auto_num_shards(2 * n_docs * max(1, replicate))

    # ONE derive pass over the (amplified) base corpus emitting the
    # tagged union of both sides directly — the two-dataset union
    # shape would run the read→repartition→amplify chain once per
    # side (Ray caches the read, not the fused amplify+derive maps).
    # frontier_batch / index_state_batch resolve through THIS module's
    # globals so tests can monkeypatch partial-frontier scenarios.
    ns = num_shards

    def both_sides(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([
            _frontier_side_table(frontier_batch(batch), ns),
            _index_side_table(index_state_batch(batch), ns),
        ])

    premerged = _documents(sf_dir, replicate).map_batches(
        both_sides, batch_format="pyarrow", batch_size=None
    )

    return schedule_datasets(
        None,
        None,
        premerged=premerged,
        num_shards=num_shards,
        checkpoint_dir=checkpoint_dir,
        seen_mode=seen_mode,
        robots_map=SANDBOX_ROBOTS if robots_map is None else robots_map,
        emit_purge=emit_purge,
        site_hosts=SANDBOX_SITE_HOSTS if site_hosts is None else site_hosts,
        run_id=run_id,
        force=force,
        n_429_for=sandbox_n_429,
    )


def schedule_datasets(
    frontier: ray.data.Dataset | None,
    index_state: ray.data.Dataset | None,
    *,
    num_shards: int,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
    robots_map: dict | None = None,
    emit_purge: bool = False,
    site_hosts: frozenset = frozenset(),
    run_id: str | None = None,
    force: bool = False,
    n_429_for=None,
    premerged: ray.data.Dataset | None = None,
    sleeptime_by_host: dict[str, float] | None = None,
) -> ray.data.Dataset:
    """The generalized scheduling core behind ``scheduled_frontier``
    (corpus) and ``crawl_live`` (real sitemaps/HTTP): frontier rows
    (url, lastmod, priority, site_id, seq) ∪ index rows (url,
    last_modified, crawler_site_id) → one host-hash shard shuffle →
    per-shard J1 lookup + is_modified + dedup/robots/order/politeness
    [+ J2 purge]."""

    def frontier_side(batch: pa.Table) -> pa.Table:
        return _frontier_side_table(batch, num_shards)

    def index_side(batch: pa.Table) -> pa.Table:
        return _index_side_table(batch, num_shards)

    if premerged is not None:
        both = premerged
    else:
        both = frontier.map_batches(
            frontier_side, batch_format="pyarrow", batch_size=None
        )
        if index_state is not None:
            both = both.union(
                index_state.map_batches(
                    index_side, batch_format="pyarrow", batch_size=None
                )
            )

    robots = robots_map or {}
    purge_hosts = site_hosts

    def schedule_group(group: pa.Table) -> pa.Table:
        f_mask = pc.equal(group["kind"], "f")
        frontier_rows = group.filter(f_mask)
        index_rows = group.filter(pc.invert(f_mask))
        sitemap_urls_lower = None
        if emit_purge:
            # membership set BEFORE any filtering: J2 tests against
            # everything the sitemaps list (reference sitemap.py:200-204)
            sitemap_urls_lower = set(
                pc.utf8_lower(frontier_rows["url"].combine_chunks()).to_pylist()
            )
        # J1 lookup inside the shard: url → last_indexed, vectorized
        # (pc.index_in + take: a null index yields a null slot).
        # index_state urls are unique per corpus contract, so
        # first-match == any-match.
        idx = pc.index_in(
            frontier_rows["url"].combine_chunks(),
            value_set=index_rows["url"].combine_chunks(),
        )
        last_indexed = (
            index_rows["last_modified"].combine_chunks()
            .take(idx).cast(pa.timestamp("us"))
        )
        frontier_rows = frontier_rows.drop(
            ["kind", "last_modified"]
        ).append_column("last_indexed", last_indexed)
        if force:
            # reference -f/--force: crawl even when not modified
            # (fetcher.py:49-51); dedup/robots still apply
            frontier_rows = frontier_rows.drop(["last_indexed"])
        else:
            frontier_rows = frontier_rows.filter(
                pa.array(is_modified_mask(frontier_rows))
            ).drop(["last_indexed"])

        shard_id = int(group["shard"][0].as_py())
        shard = FrontierShard(
            shard_id,
            checkpoint_dir=checkpoint_dir,
            seen_mode=seen_mode,
            sleeptime_by_host=sleeptime_by_host,
            robots_map=robots,
            run_id=run_id,
        )
        shard.load_checkpoint()
        # numpy scheduling path (equivalence-tested vs the sequential
        # loop in tests/test_state.py); self-falls-back to schedule()
        # for multi-retry batches where the closed form doesn't hold.
        # Oversized groups stream through the shard state in chunks so
        # scheduling never needs whole-group-sized numpy temporaries.
        if frontier_rows.num_rows > SCHEDULE_CHUNK_ROWS:
            out = pa.concat_tables(
                shard.schedule_vectorized(
                    frontier_rows.slice(off, SCHEDULE_CHUNK_ROWS),
                    n_429_for=n_429_for,
                )
                for off in range(0, frontier_rows.num_rows,
                                 SCHEDULE_CHUNK_ROWS)
            )
        else:
            out = shard.schedule_vectorized(
                frontier_rows, n_429_for=n_429_for
            )
        shard.checkpoint()

        if emit_purge:
            gone_mask = pa.array(
                [
                    sid in purge_hosts and u.lower() not in sitemap_urls_lower
                    for u, sid in zip(
                        index_rows["url"].to_pylist(),
                        index_rows["site_id"].to_pylist(),
                    )
                ]
            )
            gone = index_rows.filter(gone_mask)
            if gone.num_rows:
                n = gone.num_rows
                purge_rows = pa.table(
                    {
                        "url": gone["url"],
                        "lastmod": pa.nulls(n, pa.string()),
                        "priority": pa.nulls(n, pa.string()),
                        "site_id": gone["site_id"],
                        "seq": pa.nulls(n, pa.int64()),
                        "shard": gone["shard"],
                        "status": pa.array(["purge"] * n, pa.string()),
                        "fetch_order": pa.array([-1] * n, pa.int64()),
                        "planned_offset": pa.nulls(n, pa.float64()),
                    },
                    schema=out.schema,
                )
                out = pa.concat_tables([out, purge_rows])
        return out

    # num_partitions == num_shards: one shuffle partition per shard —
    # no empty schemaless partitions (they break downstream joins) and
    # exactly one scheduler invocation per shard.
    return both.groupby("shard", num_partitions=num_shards).map_groups(
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


def fetch_stage(scheduled: ray.data.Dataset, sf_dir: str,
                replicate: int = 1) -> ray.data.Dataset:
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

    to_fetch = scheduled.map_batches(scheduled_only, batch_format="pyarrow", batch_size=None)
    pages = read_pages(sf_dir, replicate).select_columns(
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

    return joined.map_batches(mark_status, batch_format="pyarrow", batch_size=None)


class FetchActor:
    """S5 fetch as an actor-pool stage driven BY the crawl plan —
    the production shape (reference fetcher.py:45-83 rebuilt as a
    pool): one actor holds its long-lived fetch state (HTTP session
    in production; the corpus store here) in ``__init__``, and each
    ``__call__`` turns a batch of planned urls into resource rows.

    This replaces the plan ⋈ pages hash join of ``fetch_stage``: no
    all-to-all shuffle — the plan streams straight from the scheduler
    into the pool, which is how a 10^10-url crawl must work (bodies
    come from the network, not from a joinable table). The sandbox
    resolves bodies deterministically from the base documents table
    (small by construction) keyed by doc_id.
    """

    def __init__(self, sf_dir: str):
        import pyarrow.parquet as pq

        from ..sources.pages import REPLICA_OFFSET

        t = pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        ).combine_chunks().sort_by("doc_id")
        # sorted id array + aligned text column: O(log n) vectorized
        # lookup (searchsorted) instead of a per-row Python dict get
        self._base_ids = t["doc_id"].to_numpy()
        self._texts = t["text"].combine_chunks()
        self._offset = REPLICA_OFFSET

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sources.pages import build_pages

        # vectorized twin of the row path (_doc_id_of/fetch_status_of):
        # regex-extract the trailing doc id, resolve the body by
        # searchsorted against the sorted base corpus, derive statuses
        # with modular arithmetic — no Python loop over urls.
        # digit run capped at 18 so the cast below can never overflow
        # int64 (a 19+-digit id matches nothing → quarantined
        # 'missing', instead of an ArrowInvalid killing the task)
        ex = pc.extract_regex(
            batch["url"].combine_chunks(), r"-(?P<id>\d{1,18})(?:\?.*)?$"
        )
        ids = pc.fill_null(
            pc.cast(pc.struct_field(ex, "id"), pa.int64()), -1
        ).to_numpy()
        base = np.where(ids >= 0, ids % self._offset, -1)
        pos = np.searchsorted(self._base_ids, base)
        pos_safe = np.minimum(pos, len(self._base_ids) - 1)
        found = (ids >= 0) & (self._base_ids[pos_safe] == base)
        present = pa.array(found)
        ok = batch.filter(present)
        ok_ids_np = ids[found]
        ok_ids = pa.array(ok_ids_np, pa.int64())
        ok_texts = pc.take(self._texts, pa.array(pos_safe[found]))
        pages = build_pages(ok_ids, ok_texts)
        err = ok_ids_np % 101 == 0
        red = (ok_ids_np % 103 == 0) & ~err
        status = pa.array(
            np.where(err, "fetch_error", np.where(red, "redirect", "fetched"))
        )
        resource = pa.table(
            {
                "url": ok["url"],
                "lastmod": ok["lastmod"],
                "shard": ok["shard"],
                "seq": ok["seq"],
                "fetch_order": ok["fetch_order"],
                "html": pages["html"],
                "text": pages["text"],
                "content_type": pages["content_type"],
                "site_id": pages["site_id"],
                "doc_id": pages["doc_id"],
                "fetch_status": status,
            }
        )
        missing = batch.filter(pc.invert(present))
        if missing.num_rows:
            n = missing.num_rows
            missing_t = pa.table(
                {
                    "url": missing["url"],
                    "lastmod": missing["lastmod"],
                    "shard": missing["shard"],
                    "seq": missing["seq"],
                    "fetch_order": missing["fetch_order"],
                    "html": pa.nulls(n, pa.binary()),
                    "text": pa.nulls(n, pa.string()),
                    "content_type": pa.nulls(n, pa.string()),
                    "site_id": pa.nulls(n, pa.string()),
                    "doc_id": pa.nulls(n, pa.int64()),
                    "fetch_status": pa.array(["missing"] * n, pa.string()),
                }
            )
            resource = pa.concat_tables([resource, missing_t])
        return resource


def fetch_pool(scheduled: ray.data.Dataset, sf_dir: str,
               concurrency=None, batch_size: int = 2048,
               num_cpus: float = 0.5) -> ray.data.Dataset:
    """Plan → FetchActor pool → resource rows (no shuffle).

    ``num_cpus=0.5``: fetch actors are I/O-shaped (network in
    production, object-store lookups here), so half a CPU slot each.
    The distinct resource request also keeps Ray from fusing the pool
    with the upstream per-shard ``schedule_group`` — fused, the whole
    chain inherits the scheduler's per-shard granularity (≤ occupied
    shards ≈ 25 coarse, 5x-skewed tasks on the 41-host corpus), and
    the fetch/extract stages can no longer fan out past it
    (measured: unfusing is ~2.5 s on the 1.66M-page bench crawl).

    Default ``concurrency``: ``(max(1, cluster_cpus // 8), 64)`` —
    the MIN actors spin up when the streaming plan starts, i.e. the
    pool warms DURING the schedule shuffle instead of autoscaling
    from one actor when the first plan block lands (A/B at 32 cpus:
    min 4 vs 1 saves ~2 s of ramp on the 1.66M-page crawl). The min
    must scale with the cluster: a fixed min reserves
    ``min × num_cpus`` CPUs, and at 8 cpus a min of 12 starves the
    schedule shuffle outright (measured 57-64 s vs 25-38 s)."""
    if concurrency is None:
        cpus = ray.cluster_resources().get("CPU", 8) if ray.is_initialized() else 8
        concurrency = (max(1, int(cpus) // 8), 64)

    def scheduled_only(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or "status" not in batch.column_names:
            return _FETCH_INPUT_SCHEMA.empty_table()
        batch = batch.filter(pc.equal(batch["status"], "scheduled"))
        return batch.select(_FETCH_INPUT_SCHEMA.names).cast(_FETCH_INPUT_SCHEMA)

    plan = scheduled.map_batches(scheduled_only, batch_format="pyarrow", batch_size=None)
    return plan.map_batches(
        FetchActor,
        fn_constructor_args=(sf_dir,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


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
    num_shards: int | None = 8,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
    single_url: str | None = None,
    purge: bool = True,
    force: bool = False,
    converter=None,
    solr_url: str | None = None,
    solr_transport_factory=None,
) -> dict:
    """Full pipeline; returns the lineage/metrics summary.

    Two passes, each consuming its DAG exactly once:
    1. schedule → ``{out_dir}/plan`` Parquet (the persisted crawl
       plan doubles as per-partition lineage; shard checkpoints are
       written as a side effect, once).
    2. plan → fetch actor pool → extract/quarantine →
       ``{out_dir}/docs`` Parquet partitioned by shard (resumable
       layout: one directory per shard).
    Plus the always-on sub-pipelines of the reference lifecycle:
    - purge anti-join → ``{out_dir}/purged`` tombstones (reference
      purging.py:8-30; still runs in single-url mode, main.py:102)
    - index-state update → ``{out_dir}/index_state`` (url, uid,
      last_modified of newly indexed docs — the Solr-state stand-in)
    - per-shard metrics → ``{out_dir}/lineage`` (from checkpoints)

    ``single_url`` replicates ``bin/crawl config.py <url>``
    (reference main.py:76-77,117-119): everything but that url is
    filtered out before scheduling; purge is skipped.
    Status counts come from the written Parquet (metadata-cheap), not
    from re-executing operators.
    """
    import shutil
    import uuid

    import pyarrow.dataset as pads

    from ..state.frontier import commit_checkpoints

    plan_dir = f"{out_dir}/plan"
    docs_dir = f"{out_dir}/docs"

    # Overwrite semantics: Ray's write_parquet appends files into an
    # existing directory, so a re-run with the same --out would
    # double-count the prior plan and re-append docs. Clear the output
    # subdirs (NEVER the checkpoint dir — that is the resume state).
    for sub in ("plan", "docs", "index_state", "purged", "lineage"):
        shutil.rmtree(f"{out_dir}/{sub}", ignore_errors=True)

    run_id = uuid.uuid4().hex[:12]
    sched = scheduled_frontier(
        sf_dir, num_shards=num_shards, checkpoint_dir=checkpoint_dir,
        seen_mode=seen_mode, emit_purge=purge, run_id=run_id, force=force,
    )
    if single_url is not None:
        # reference main.py:76-77,117-119: non-matching SITES are
        # skipped entirely before crawl_site, so purge runs only for
        # the site owning the target url; within that site every
        # non-matching url_info is skipped
        from ..functions.urlnorm import host_of

        target = single_url
        target_host = host_of(single_url)
        sched = sched.map_batches(
            lambda t: t.filter(
                pc.or_(
                    pc.equal(t["url"], target),
                    pc.and_(pc.equal(t["status"], "purge"),
                            pc.equal(t["site_id"], target_host)),
                )
            ),
            batch_format="pyarrow", batch_size=None,
        )
    sched.write_parquet(plan_dir)
    if checkpoint_dir:
        # plan is durable → promote this run's staged shard
        # checkpoints (retry-safe: see FrontierShard.checkpoint)
        commit_checkpoints(checkpoint_dir, run_id)

    plan_counts = _status_counts(plan_dir, "status")

    fetch_counts: dict[str, int] = {}
    if plan_counts.get("scheduled", 0) > 0:
        from ..stages.util import payload_block_ctx

        with payload_block_ctx():
            # 16 MiB output blocks through the payload-expanding
            # fetch→extract chain so extract fans out past the fetch
            # task count (see payload_block_ctx). The plan read is
            # floored to ~2k scheduled urls per block: one block is
            # one fetch-pool task, and a byte-sized read of the
            # (small) plan would occupy only a handful of actors.
            n_sched = plan_counts.get("scheduled", 0)
            plan = sized_read_parquet(
                plan_dir,
                min_blocks=min(max(n_sched // 2048, 1), 1024),
            )
            fetched = fetch_pool(plan, sf_dir)
            engine = ExtractionEngine(
                corpus_config(), converter=converter, crawl_ts=CRAWL_TS,
                keep_input_columns=("url", "shard", "seq", "fetch_status"),
                strict=True,
            )
            fetched.map_batches(
                ExtractOrQuarantine(engine), batch_format="pyarrow",
                batch_size=None,
            ).write_parquet(docs_dir, partition_cols=["shard"])
        fetch_counts = _status_counts(docs_dir, "fetch_status")
        # index-state update: what a Solr index would now contain for
        # the docs just indexed (reference: Solr is the state store).
        # Streaming Dataset read→project→write — never materialized
        # on the driver (this table is corpus-sized at scale).
        state = sized_read_parquet(
            docs_dir, columns=["url", "UID", "modified", "fetch_status"]
        )
        state.map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "fetched"))
            .drop(["fetch_status"])
            .rename_columns(["url", "uid", "last_modified"]),
            batch_format="pyarrow", batch_size=None,
        ).write_parquet(f"{out_dir}/index_state")

    n_solr_indexed = 0
    if solr_url is not None and fetch_counts.get("fetched", 0) > 0:
        # S9 live indexing: stream the written docs through a
        # SolrIndexer actor pool (one session per actor, one update
        # POST per block) — distributed posting, driver holds counts
        from ..sinks import SolrIndexer

        counts = sized_read_parquet(docs_dir).map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "fetched")),
            batch_format="pyarrow", batch_size=None,
        ).map_batches(
            SolrIndexer,
            fn_constructor_args=(solr_url, solr_transport_factory),
            batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
        ).to_pandas()
        n_solr_indexed = int(counts["n"].sum()) if len(counts) else 0

    n_purged = 0
    if purge and plan_counts.get("purge", 0) > 0:
        # tombstones come straight from the plan (J2 rode the shard
        # shuffle); uid = md5-UUID of the url (UIDExtractor semantics)
        from ..functions.urlnorm import uid_for_url

        def to_tombstones(batch: pa.Table) -> pa.Table:
            batch = batch.filter(pc.equal(batch["status"], "purge"))
            urls = batch["url"].to_pylist()
            return pa.table(
                {
                    "uid": pa.array([uid_for_url(u) for u in urls], pa.string()),
                    "url": pa.array(urls, pa.string()),
                }
            )

        sized_read_parquet(plan_dir).map_batches(
            to_tombstones, batch_format="pyarrow", batch_size=None
        ).write_parquet(f"{out_dir}/purged")
        n_purged = plan_counts["purge"]
        if solr_url is not None:
            # S10 live deletes (reference purging.py:26-30)
            from ..sinks import SolrPurger

            sized_read_parquet(f"{out_dir}/purged").map_batches(
                SolrPurger,
                fn_constructor_args=(solr_url, solr_transport_factory),
                batch_format="pyarrow", batch_size=512, concurrency=(1, 2),
            ).count()

    if checkpoint_dir:
        write_lineage(checkpoint_dir, f"{out_dir}/lineage")

    return {
        "plan_counts": plan_counts,
        "fetch_counts": fetch_counts,
        "n_extracted": fetch_counts.get("fetched", 0),
        "n_solr_indexed": n_solr_indexed,
        "n_purged": n_purged,
        "out_dir": out_dir,
        "checkpoint_dir": checkpoint_dir,
        "num_shards": num_shards,
    }


def _status_counts(parquet_dir: str, column: str) -> dict[str, int]:
    """Per-status row counts over a Parquet directory via DuckDB —
    streams with constant driver memory (never to_table the column)."""
    import duckdb

    rows = duckdb.sql(
        f"SELECT {column}, count(*) AS n "
        f"FROM read_parquet('{parquet_dir}/**/*.parquet', hive_partitioning=true) "
        f"GROUP BY 1"
    ).fetchall()
    return {k: int(v) for k, v in rows}


def write_lineage(checkpoint_dir: str, lineage_dir: str) -> None:
    """Per-shard metrics from the checkpoints → one small Parquet
    (north_rule: per-partition lineage + metrics)."""
    import glob as _glob

    import pyarrow.parquet as pqm

    rows = {"shard_id": [], "seen_mode": [], "high_seq": [], "n_seen": [],
            "n_scheduled": []}
    for path in sorted(_glob.glob(os.path.join(checkpoint_dir, "shard-*.parquet"))):
        row = pqm.read_table(
            path, columns=["shard_id", "seen_mode", "high_seq", "n_seen",
                           "n_scheduled"]
        ).to_pylist()[0]
        for k in rows:
            rows[k].append(row[k])
    os.makedirs(lineage_dir, exist_ok=True)
    pqm.write_table(pa.table(rows), os.path.join(lineage_dir, "shards.parquet"))


def crawl_output(sf_dir: str, num_shards: int = 8,
                 replicate: int = 1) -> ray.data.Dataset:
    """The extracted-documents Dataset of a fresh crawl (no
    checkpoint side effects) — used by the oracle-checked query."""
    scheduled = scheduled_frontier(sf_dir, num_shards=num_shards,
                                   replicate=replicate)
    fetched = fetch_pool(scheduled, sf_dir)
    ok = fetched.map_batches(
        lambda t: t.filter(pc.equal(t["fetch_status"], "fetched")),
        batch_format="pyarrow",
    )
    engine = ExtractionEngine(
        corpus_config(), crawl_ts=CRAWL_TS, keep_input_columns=("url",),
        strict=True,
    )
    return ok.map_batches(engine, batch_format="pyarrow", batch_size=None)
