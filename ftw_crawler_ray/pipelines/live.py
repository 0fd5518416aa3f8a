"""crawl_live — the PRODUCTION lifecycle over real HTTP, composing
the same stages the hermetic corpus pipeline uses:

    sitemap discovery (S1-S4, RequestsFetch)   ──┐
    previous run's index_state Parquet (T4)    ──┤
      ──► schedule_datasets: ONE host-hash shard shuffle
            [J1 ∥ is_modified ∥ URL-seen dedup ∥ robots (live
             robots.txt) ∥ priority order ∥ politeness ∥ checkpoint]
      ──► plan Parquet
      ──► HttpFetchActor pool (redirect-forbidden, 429 backoff,
            optional planned-offset pacing)
      ──► ExtractionEngine (HtmlConverter by default; pass a
            DispatchConverter(binary=TikaConverter(...)) for PDFs)
      ──► docs Parquet partitioned by shard ∥ index_state update

A reference user's entire ``bin/crawl config.py`` loop maps to one
``crawl_live(config.sites, out_dir, config=config)`` call. Tested
end-to-end against a loopback HTTP site in tests/test_live_crawl.py
(sitemap + robots.txt + pages + 404 + redirect + resume).
"""

from __future__ import annotations

import time
import uuid

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages.util import sized_read_parquet

from ..engine import ExtractionEngine, HtmlConverter
from ..functions.urlnorm import host_of
from ..sources.sitemap import frontier_from_sites
from ..state.frontier import commit_checkpoints
from .crawl import ExtractOrQuarantine, _status_counts, schedule_datasets
from .fetch_http import HttpFetchActor, RequestsFetch


def live_robots(sites, fetch) -> dict[str, str]:
    """robots.txt per site host (beyond-reference: the reference
    ignores robots entirely). 200 → rules; anything else → no rules.
    Driver-side: one small GET per site."""
    from urllib.parse import urlsplit

    robots: dict[str, str] = {}
    for site in sites:
        host = host_of(site.url)
        if host in robots:
            continue
        parts = urlsplit(site.url)
        try:
            status, _, body = fetch(
                f"{parts.scheme}://{parts.netloc}/robots.txt"
            )
        except Exception:
            continue
        if status == 200 and body:
            robots[host] = (
                body.decode("utf-8", "replace")
                if isinstance(body, bytes) else body
            )
    return robots


def crawl_live(
    sites,
    out_dir: str,
    *,
    fetch=None,
    num_shards: int = 4,
    checkpoint_dir: str | None = None,
    seen_mode: str = "exact",
    config=None,
    converter=None,
    index_state_dir: str | None = None,
    concurrency=(1, 8),
    batch_size: int = 64,
    force: bool = False,
    pace: bool = False,
    base_sleeptime: float = 0.1,
    fetch_timeout: float = 10.0,
    single_url: str | None = None,
    solr_url: str | None = None,
    solr_transport_factory=None,
) -> dict:
    """Full production crawl over HTTP; returns the summary dict
    (same shape as the corpus ``crawl()``).

    ``index_state_dir`` points at a previous run's
    ``{out}/index_state`` for incrementality (J1/is_modified);
    omitted → everything is new. ``pace=True`` makes the fetch pool
    honor the scheduler's planned politeness offsets in real time.
    """
    import shutil

    from .extract import corpus_config

    fetch = fetch or RequestsFetch(timeout=fetch_timeout)
    if single_url is not None:
        # reference main.py:76-77: skip non-matching sites entirely
        sites = [s for s in sites if single_url.startswith(s.url)]
    for sub in ("plan", "docs", "index_state"):
        shutil.rmtree(f"{out_dir}/{sub}", ignore_errors=True)

    # S1-S4: sitemap discovery → frontier rows with the reference's
    # (site_seq, sitemap_seq, url_seq) total order flattened to one
    # seq (bounded: <1e6 sitemaps/site and urls/sitemap)
    def to_schedule_cols(t: pa.Table) -> pa.Table:
        seq = pc.add(
            pc.multiply(
                pc.add(
                    pc.multiply(t["site_seq"], pa.scalar(1_000_000)),
                    t["sitemap_seq"],
                ),
                pa.scalar(1_000_000),
            ),
            t["url_seq"],
        )
        return pa.table(
            {
                "url": t["url"],
                "lastmod": t["lastmod"],
                "priority": t["priority"],
                "site_id": pa.array(
                    [host_of(u) for u in t["url"].to_pylist()], pa.string()
                ),
                "seq": seq.cast(pa.int64()),
            }
        )

    frontier = frontier_from_sites(sites, fetch).map_batches(
        to_schedule_cols, batch_format="pyarrow", batch_size=None
    )
    if single_url is not None:
        # reference main.py:117-119: within the site, every
        # non-matching url_info is skipped
        target = single_url
        frontier = frontier.map_batches(
            lambda t: t.filter(pc.equal(t["url"], target)),
            batch_format="pyarrow", batch_size=None,
        )
    index_state = None
    if index_state_dir is not None:
        index_state = sized_read_parquet(index_state_dir).map_batches(
            lambda t: pa.table(
                {
                    "url": t["url"],
                    "last_modified": t["last_modified"],
                    "crawler_site_id": pa.array(
                        [host_of(u) for u in t["url"].to_pylist()],
                        pa.string(),
                    ),
                }
            ),
            batch_format="pyarrow", batch_size=None,
        )

    run_id = uuid.uuid4().hex[:12]
    sched = schedule_datasets(
        frontier,
        index_state,
        num_shards=num_shards,
        checkpoint_dir=checkpoint_dir,
        seen_mode=seen_mode,
        robots_map=live_robots(sites, fetch),
        run_id=run_id,
        force=force,
        # per-Site politeness spacing (reference configuration.py:67)
        sleeptime_by_host={
            host_of(site.url): site.sleeptime for site in sites
        },
    )
    sched.write_parquet(f"{out_dir}/plan")
    if checkpoint_dir:
        commit_checkpoints(checkpoint_dir, run_id)

    plan_counts = _status_counts(f"{out_dir}/plan", "status")
    fetch_counts: dict[str, int] = {}
    if plan_counts.get("scheduled", 0) > 0:
        from ..stages.util import payload_block_ctx

        with payload_block_ctx():
            # 16 MiB output blocks through fetch→extract (see
            # payload_block_ctx). Plan fan-out (≥1 block per ~512
            # urls, so the whole actor pool is busy) ONLY under
            # pace=True: planned-offset pacing is wall-clock
            # absolute, so politeness holds however the plan is
            # split — but with pace=False politeness comes from
            # actors fetching a host's rows sequentially, which
            # splitting would break.
            min_blocks = (
                min(max(plan_counts["scheduled"] // 512, 1), 1024)
                if pace else None
            )
            plan = sized_read_parquet(
                f"{out_dir}/plan", min_blocks=min_blocks,
            ).map_batches(
                lambda t: t.filter(pc.equal(t["status"], "scheduled")),
                batch_format="pyarrow", batch_size=None,
            )
            fetched = plan.map_batches(
                HttpFetchActor,
                fn_constructor_kwargs={
                    "base_sleeptime": base_sleeptime,
                    "timeout": fetch_timeout,
                    "force": force,
                    "pace_from": time.time() if pace else None,
                },
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
            engine = ExtractionEngine(
                config if config is not None else corpus_config(),
                converter=(converter if converter is not None
                           else HtmlConverter()),
                crawl_ts=None,
                keep_input_columns=("url", "shard", "seq", "fetch_status"),
                strict=True,
            )
            fetched.map_batches(
                ExtractOrQuarantine(engine), batch_format="pyarrow",
                batch_size=None,
            ).write_parquet(f"{out_dir}/docs", partition_cols=["shard"])
        fetch_counts = _status_counts(f"{out_dir}/docs", "fetch_status")

        state = sized_read_parquet(
            f"{out_dir}/docs", columns=["url", "UID", "modified",
                                        "fetch_status"]
        )
        state.map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "fetched"))
            .drop(["fetch_status"])
            .rename_columns(["url", "uid", "last_modified"]),
            batch_format="pyarrow", batch_size=None,
        ).write_parquet(f"{out_dir}/index_state")

    n_solr_indexed = 0
    if solr_url is not None and fetch_counts.get("fetched", 0) > 0:
        # S9 live indexing — same actor-pool posting as the corpus
        # crawl (pipelines/crawl.py S9 block)
        from ..sinks import SolrIndexer

        counts = sized_read_parquet(f"{out_dir}/docs").map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "fetched")),
            batch_format="pyarrow", batch_size=None,
        ).map_batches(
            SolrIndexer,
            fn_constructor_args=(solr_url, solr_transport_factory),
            batch_format="pyarrow", batch_size=512, concurrency=(1, 4),
        ).to_pandas()
        n_solr_indexed = int(counts["n"].sum()) if len(counts) else 0

    return {
        "plan_counts": plan_counts,
        "fetch_counts": fetch_counts,
        "n_extracted": fetch_counts.get("fetched", 0),
        "n_solr_indexed": n_solr_indexed,
        "out_dir": out_dir,
        "checkpoint_dir": checkpoint_dir,
        "num_shards": num_shards,
    }
