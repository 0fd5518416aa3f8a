"""Constrained-memory streaming proof for BASELINE.md: the full
bench crawl (schedule → fetch pool → extract) at a large replicate
with the OBJECT STORE CAPPED far below the working set, showing Ray
Data's backpressure + spilling keep the pipeline correct and moving —
the property a 100 TB cluster actually depends on.

    python tools/stress_memory.py 4        # 4 GiB store cap
    python tools/stress_memory.py none     # uncapped control

Prints one JSON line: wall time, pages crawled, spill/restore bytes
(from Ray's memory summary). Compare n_crawled across the capped and
uncapped runs — the output must be identical. Env:
GRAFT_SF_DIR (default sf0.1), RAY_GRAFT_CPUS (32),
GRAFT_REPLICATE (1500 ≈ 7.5M pages ≈ 10× a 4 GiB store).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cap_arg = sys.argv[1] if len(sys.argv) > 1 else "4"
    cap_bytes = None if cap_arg == "none" else int(float(cap_arg) * (1 << 30))
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicate = int(os.environ.get("GRAFT_REPLICATE", "1500"))

    import ray

    kw = {"object_store_memory": cap_bytes} if cap_bytes else {}
    ray.init(address="local", num_cpus=cpus, include_dashboard=False, **kw)
    import pyarrow.compute as pc
    import ray.data

    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 16 * 1024 * 1024

    from ftw_crawler_ray.engine import ExtractionEngine
    from ftw_crawler_ray.pipelines.crawl import fetch_pool, scheduled_frontier
    from ftw_crawler_ray.pipelines.extract import CRAWL_TS, corpus_config

    # small untimed warmup (worker pool + page cache)
    fetch_pool(scheduled_frontier(sf_dir, num_shards=128, replicate=1),
               sf_dir).count()

    engine = ExtractionEngine(
        corpus_config(), crawl_ts=CRAWL_TS, keep_input_columns=("url",),
        strict=True,
    )
    t0 = time.time()
    n_crawled = (
        fetch_pool(
            scheduled_frontier(sf_dir, num_shards=128, replicate=replicate),
            sf_dir,
        )
        .map_batches(
            lambda t: t.filter(pc.equal(t["fetch_status"], "fetched")),
            batch_format="pyarrow",
        )
        .map_batches(engine, batch_format="pyarrow", batch_size=None)
        .count()
    )
    secs = round(time.time() - t0, 2)

    # spill accounting from the raylet log (the grpc-backed
    # memory_summary API is unavailable in this container): the local
    # object manager logs cumulative "Spilled/Restored N MiB, M
    # objects" lines; take the last occurrence of each
    spilled = restored = None
    try:
        session_dir = ray._private.worker._global_node.get_session_dir_path()
        log_path = os.path.join(session_dir, "logs", "raylet.out")
        with open(log_path, errors="replace") as f:
            for line in f:
                m = re.search(r"Spilled (\d+) MiB, (\d+) objects", line)
                if m:
                    spilled = m
                m = re.search(r"Restored (\d+) MiB, (\d+) objects", line)
                if m:
                    restored = m
    except (OSError, AttributeError):
        pass
    out = {
        "stress": "capped_store_crawl",
        "store_cap_gib": None if cap_bytes is None else cap_arg,
        "sec": secs,
        "n_crawled": n_crawled,
        "pages_per_sec": round(n_crawled / secs, 1),
        "spilled_mib": int(spilled.group(1)) if spilled else 0,
        "spilled_objects": int(spilled.group(2)) if spilled else 0,
        "restored_mib": int(restored.group(1)) if restored else 0,
        "replicate": replicate,
        "num_cpus": cpus,
        "sf": sf_dir,
    }
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
