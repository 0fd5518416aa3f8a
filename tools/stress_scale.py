"""High-cardinality / dup-heavy stress timings for BASELINE.md.

Builds synthetic stress corpora under /tmp (deterministic) and times
the stages whose scale shape the round-3 verdict flagged:

    python tools/stress_scale.py sessionize   # 1e6 users, rows-linear check
    python tools/stress_scale.py windows      # >=1e6 distinct (hour,type) keys
    python tools/stress_scale.py dedup        # 40x near-dup clique A/B guard
    python tools/stress_scale.py corpus_prep  # full composition at 40x

Each subcommand prints one JSON line. Own Ray session (tools are CLI
entry points; library code never calls ray.init).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _events_table(n_rows: int, n_users: int, span_hours: int,
                  seed: int = 7) -> pa.Table:
    rng = np.random.default_rng(seed)
    user = rng.integers(0, n_users, size=n_rows).astype(np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offs = rng.integers(0, span_hours * 3600, size=n_rows)
    ts = base + offs.astype("timedelta64[s]").astype("timedelta64[us]")
    types = pa.array(
        ["t" + str(int(x)) for x in rng.integers(0, 10, size=n_rows)],
        pa.string(),
    )
    return pa.table(
        {
            "event_id": pa.array(np.arange(n_rows), pa.int64()),
            "user_id": pa.array(user, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "event_type": types,
            "value": pa.array(rng.random(n_rows) * 100, pa.float64()),
        }
    )


def _write_events(dir_: str, table: pa.Table) -> str:
    os.makedirs(dir_, exist_ok=True)
    pq.write_table(table, os.path.join(dir_, "events.parquet"))
    return dir_


def _timed(fn, *a, **kw):
    t0 = time.monotonic()
    out = fn(*a, **kw)
    return out, time.monotonic() - t0


def stress_sessionize():
    """Same row count, user cardinality 1e4 vs 1e6: wall time must be
    ~flat (linear in rows, not users)."""
    import ray

    from ftw_crawler_ray.stages.window import sessionize

    n_rows = 5_000_000
    res = {}
    for n_users in (10_000, 1_000_000):
        d = f"/tmp/stress_sessionize_{n_users}"
        _write_events(d, _events_table(n_rows, n_users, span_hours=24 * 30))
        n, secs = _timed(lambda: sessionize(d).count())
        res[f"users_{n_users}"] = {"sessions": n, "sec": round(secs, 2)}
        shutil.rmtree(d)
    res["rows"] = n_rows
    res["ratio_1e6_over_1e4"] = round(
        res["users_1000000"]["sec"] / res["users_10000"]["sec"], 2
    )
    return res


def stress_windows():
    """hourly_event_stats at >=1e6 distinct (hour, event_type) keys."""
    from ftw_crawler_ray.stages.window import hourly_event_stats

    n_rows = 5_000_000
    span_hours = 120_000  # x10 types ~= 1.2M distinct keys
    d = "/tmp/stress_windows"
    _write_events(d, _events_table(n_rows, 1000, span_hours=span_hours))
    n, secs = _timed(lambda: hourly_event_stats(d).count())
    shutil.rmtree(d)
    return {"rows": n_rows, "distinct_keys": n, "sec": round(secs, 2)}


def _dup40_corpus(d: str) -> int:
    """40x near-dup clique corpus from sf0.01 documents (20k docs,
    each original a 40-member near-dup clique). Returns doc count."""
    src = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    reps = []
    for rep in range(40):
        ids = pa.compute.add(src["doc_id"], rep * 1_000_003)
        if rep == 0:
            texts = src["text"]
        else:
            # near-dup: append one rare token so jaccard stays high
            texts = pa.compute.binary_join_element_wise(
                src["text"], f"zz{rep}tail", " "
            )
        reps.append(pa.table({"doc_id": ids, "text": texts}))
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.concat_tables(reps), os.path.join(d, "documents.parquet"))
    return src.num_rows * 40


def stress_dedup():
    """40x near-dup clique corpus (the r3 regression guard):
    minhash_verified_pairs + dedup_clusters wall time."""
    from ftw_crawler_ray.stages.dedup import (
        dedup_clusters,
        minhash_verified_pairs,
    )

    d = "/tmp/stress_dedup40"
    n_docs = _dup40_corpus(d)

    n_pairs, sec_pairs = _timed(
        lambda: minhash_verified_pairs(d).count()
    )
    n_clusters, sec_clusters = _timed(lambda: dedup_clusters(d).count())
    shutil.rmtree(d)
    return {
        "docs": n_docs,
        "verified_pairs": n_pairs,
        "verified_sec": round(sec_pairs, 2),
        "cluster_rows": n_clusters,
        "clusters_sec": round(sec_clusters, 2),
    }


def stress_dedup200():
    """200× EXACT-dup clique corpus (100k docs, 500 cliques × 200
    identical texts): dedup_clusters must collapse each clique in the
    exact stage (one keeper, 199 int edges) — the r3 composition
    guard, re-run after the r5 unpinning."""
    import pyarrow.compute as pac

    from ftw_crawler_ray.stages.dedup import dedup_clusters

    d = "/tmp/stress_dedup200"
    src = pq.read_table("/root/testdata/sf0.01/documents.parquet",
                        columns=["doc_id", "text"])
    reps = [
        pa.table({"doc_id": pac.add(src["doc_id"], rep * 1_000_003),
                  "text": src["text"]})
        for rep in range(200)
    ]
    os.makedirs(d, exist_ok=True)
    pq.write_table(pa.concat_tables(reps),
                   os.path.join(d, "documents.parquet"))
    n, secs = _timed(lambda: dedup_clusters(d).count())
    shutil.rmtree(d)
    return {"docs": src.num_rows * 200, "cluster_rows": n,
            "sec": round(secs, 2)}


def stress_corpus_prep():
    """The full quality→dedup→pack composition on the 40x dup-heavy
    corpus: dominated by the dedup stage, so wall time must track the
    dedup_clusters stress number, and every 40-member clique that
    passes the gate must collapse to ONE packed row."""
    from ftw_crawler_ray.pipelines.recipe import corpus_prep

    d = "/tmp/stress_corpus_prep40"
    n_docs = _dup40_corpus(d)
    scratch = os.path.join(d, "scratch")
    n_packed, secs = _timed(
        lambda: corpus_prep(d, scratch_dir=scratch).count()
    )
    shutil.rmtree(d)
    return {
        "docs": n_docs,
        "packed_rows": n_packed,
        "sec": round(secs, 2),
    }


def stress_topk():
    """topk_per_source on a 5M-row corpus, balanced (200 uniform
    sources) vs skewed (one source owns 90% of rows): wall time must
    be ~flat — the r4-weak `groupby(source).map_groups` shape would
    put 4.5M rows in ONE task on the skewed side."""
    import ray.data

    from ftw_crawler_ray.stages.textstats import topk_per_source_ds

    n_rows = 5_000_000

    def make(skewed: bool):
        def gen(batch):
            ids = batch["id"].to_numpy().astype(np.int64)
            if skewed:
                # 90% src0, the tail spread over 199 other sources
                src = np.where(
                    ids % 10 != 9, "src0",
                    np.char.add("src", ((ids % 199) + 1).astype(str)),
                )
            else:
                src = np.char.add("src", (ids % 200).astype(str))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(src, pa.string()),
                    "n_chars": pa.array(
                        (ids * 2654435761) % 100_000, pa.int64()
                    ),
                }
            )

        return ray.data.range(n_rows, override_num_blocks=256).map_batches(
            gen, batch_format="pyarrow", batch_size=None
        )

    res = {"rows": n_rows}
    for label, skewed in (("balanced", False), ("skewed_90pct", True)):
        n, secs = _timed(
            lambda: topk_per_source_ds(make(skewed), k=3).count()
        )
        res[label] = {"topk_rows": n, "sec": round(secs, 2)}
    res["skew_over_balanced"] = round(
        res["skewed_90pct"]["sec"] / res["balanced"]["sec"], 2
    )
    return res


def main():
    import ray

    which = sys.argv[1] if len(sys.argv) > 1 else "sessionize"
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    ray.init(address="local", num_cpus=cpus, include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    fn = {"sessionize": stress_sessionize, "windows": stress_windows,
          "dedup": stress_dedup, "dedup200": stress_dedup200,
          "corpus_prep": stress_corpus_prep, "topk": stress_topk}[which]
    out = fn()
    out["stress"] = which
    out["num_cpus"] = cpus
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
