"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code.

The synthetic corpus (pages / frontier / index_state) is derived
deterministically from the driver's ``documents`` view with pure
column expressions (ftw_crawler_ray/sources/pages.py), so every
crawl-pipeline stage has an exact ANSI-SQL oracle over the
pre-registered DuckDB views. Column names match 1:1 between each
``queries()`` entry and its ``oracle_sql()`` string.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# ---------------------------------------------------------------------------
# Shared SQL fragments — the DuckDB re-synthesis of the corpus.
# Must mirror ftw_crawler_ray/sources/pages.py exactly.
# ---------------------------------------------------------------------------

SQL_RESOURCES = r"""
resources AS (
    SELECT
        doc_id,
        'h' || (doc_id % 41) || '.example.org' AS site_id,
        'http://h' || (doc_id % 41) || '.example.org/docs/page-' || doc_id AS url,
        TIMESTAMP '2020-01-01' + doc_id * INTERVAL 1 MINUTE AS warc_ts,
        'Doc ' || doc_id AS title,
        trim(regexp_replace('Doc ' || doc_id || chr(10) || text, '\s+', ' ', 'g')) AS searchable,
        CASE WHEN doc_id % 3 = 2 THEN NULL
             ELSE strftime(TIMESTAMP '2020-01-01' + doc_id * INTERVAL 1 MINUTE,
                           '%Y-%m-%dT%H:%M:%S') END AS lastmod,
        CASE WHEN doc_id % 5 = 0 THEN 'daily' END AS changefreq,
        CASE WHEN doc_id % 7 = 0 THEN '1.0' ELSE '0.5' END AS priority,
        CASE WHEN doc_id % 13 = 0
             THEN 'http://h' || (doc_id % 41) || '.example.org/docs/page-'
                  || doc_id || '?target=1' END AS target,
        doc_id AS seq,
        lang
    FROM documents
)
"""

SQL_UID = (
    "substr(md5({u}), 1, 8) || '-' || substr(md5({u}), 9, 4) || '-' || "
    "substr(md5({u}), 13, 4) || '-' || substr(md5({u}), 17, 4) || '-' || "
    "substr(md5({u}), 21, 12)"
)

# word-5-gram shingle sets + pairwise intersection counts — shared by
# the minhash_verified and minhash_dedup oracles (exact re-derivation
# of the engine's shingling: split on \s+, drop empties, 5-gram
# join-by-space, whole-text gram when <5 words)
SQL_MINHASH_GRAMS = r"""words AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS w
    FROM documents
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(range(1, len(w) - 3),
                                    i -> array_to_string(w[i:i+4], ' '))
           END AS gs
    FROM words
),
sets AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
    FROM sets a JOIN sets b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
)"""

# SimHash signature CTE — shared by the simhash and simhash_pairs
# oracles. Recomputes the engine's signature exactly: md5-prefix
# uint64 per word (stages/dedup.py _word_hash_md5), ±1 vote per bit,
# majority → bit set; empty/whitespace-only text → 0.
SQL_SIMHASH_SIG = r"""WITH swords AS (
    SELECT doc_id,
           unnest(regexp_split_to_array(
               trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) AS w
    FROM documents WHERE trim(text) != ''
),
swh AS (
    SELECT doc_id,
           CAST(concat('0x', substr(md5(w), 1, 16)) AS UBIGINT) AS h
    FROM swords
),
sbits AS (
    SELECT doc_id, b.bit,
           sum(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS acc
    FROM swh CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS bit) b
    GROUP BY doc_id, b.bit
),
sig AS (
    SELECT doc_id,
           CAST(sum(CASE WHEN acc > 0 THEN (CAST(1 AS UBIGINT) << bit)
                         ELSE CAST(0 AS UBIGINT) END) AS UBIGINT) AS simhash
    FROM sbits GROUP BY doc_id
)
"""

SQL_INDEX_STATE = r"""
index_state AS (
    SELECT u.url,
           u.last_modified,
           u.crawler_site_id
    FROM (
        SELECT 'http://h' || (doc_id % 41) || '.example.org/docs/page-' || doc_id AS url,
               TIMESTAMP '2020-01-01' + doc_id * INTERVAL 1 MINUTE
                   + CASE WHEN doc_id % 6 = 0 THEN INTERVAL 1 DAY
                          ELSE - INTERVAL 1 DAY END AS last_modified,
               'h' || (doc_id % 41) || '.example.org' AS crawler_site_id
        FROM documents WHERE doc_id % 6 IN (0, 3)
        UNION ALL
        SELECT 'http://h' || (doc_id % 41) || '.example.org/docs/gone-' || doc_id,
               TIMESTAMP '2020-01-01' + doc_id * INTERVAL 1 MINUTE,
               'h' || (doc_id % 41) || '.example.org'
        FROM documents WHERE doc_id % 11 = 0
        UNION ALL
        SELECT 'http://other.example.net/docs/page-' || doc_id,
               TIMESTAMP '2020-01-01' + doc_id * INTERVAL 1 MINUTE,
               'other.example.net'
        FROM documents WHERE doc_id % 19 = 0
    ) u
)
"""


def entry() -> Any:
    """Flagship: full 20-field extraction over sf0.001 (SURVEY.md §7.0)."""
    from ftw_crawler_ray.pipelines.extract import extract_pipeline

    return extract_pipeline("/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# queries() — Ray Data implementations
# ---------------------------------------------------------------------------


def _q_extract_pages(sf_dir: str):
    from ftw_crawler_ray.pipelines.extract import extract_pipeline

    ds = extract_pipeline(sf_dir)
    return ds.select_columns(
        [
            "url",
            "UID",
            "getId",
            "getRemoteUrl",
            "path_string",
            "Title",
            "SearchableText",
            "snippetText",
            "portal_type",
            "object_type",
            "site_area",
            "created",
            "modified",
            "effective",
            "expires",
            "showinsearch",
        ]
    )


def _q_frontier_build(sf_dir: str):
    from ftw_crawler_ray.sources.pages import read_frontier

    return read_frontier(sf_dir)


def _q_frontier_join_index(sf_dir: str):
    from ftw_crawler_ray.stages.incremental import join_index_state

    return join_index_state(sf_dir)


def _q_fetch_candidates(sf_dir: str):
    from ftw_crawler_ray.stages.incremental import fetch_candidates

    return fetch_candidates(sf_dir)


def _q_purge_candidates(sf_dir: str):
    from ftw_crawler_ray.stages.purge import purge_candidates

    return purge_candidates(sf_dir)


def _q_host_stats(sf_dir: str):
    from ftw_crawler_ray.stages.stats import host_stats

    return host_stats(sf_dir)


def _q_dedup_exact(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import dedup_exact

    return dedup_exact(sf_dir)


def _q_token_count(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import token_counts

    return token_counts(sf_dir)


def _q_token_count_bpe(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import token_counts_bpe

    return token_counts_bpe(sf_dir)


def _q_window_events(sf_dir: str):
    from ftw_crawler_ray.stages.window import hourly_event_stats

    return hourly_event_stats(sf_dir)


def _q_topk_per_source(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import topk_docs_per_source

    return topk_docs_per_source(sf_dir, k=3)


def _q_source_mix(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import source_mix

    return source_mix(sf_dir)


def _q_sliding_windows(sf_dir: str):
    from ftw_crawler_ray.stages.window import sliding_window_counts

    return sliding_window_counts(sf_dir)


def _q_approx_users(sf_dir: str):
    from ftw_crawler_ray.stages.sketches import approx_distinct_users_per_type

    return approx_distinct_users_per_type(sf_dir)


def _q_crawl_schedule(sf_dir: str):
    import pyarrow.compute as pc

    from ftw_crawler_ray.pipelines.crawl import scheduled_frontier

    sched = scheduled_frontier(sf_dir, num_shards=8)
    return sched.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "scheduled")).select(
            ["url", "site_id", "fetch_order"]
        ),
        batch_format="pyarrow",
    )


def _q_crawl_seen(sf_dir: str):
    import pyarrow.compute as pc

    from ftw_crawler_ray.pipelines.crawl import scheduled_frontier

    sched = scheduled_frontier(sf_dir, num_shards=8)
    # corpus urls are already canonical (lowercase, unique), so the
    # URL-seen set is exactly the non-dup admitted rows
    return sched.map_batches(
        lambda t: t.filter(pc.invert(pc.equal(t["status"], "dup"))).select(
            ["url"]
        ).rename_columns(["url_seen"]),
        batch_format="pyarrow",
    )


def _q_crawl_docs(sf_dir: str):
    from ftw_crawler_ray.pipelines.crawl import crawl_output

    return crawl_output(sf_dir, num_shards=8).select_columns(
        ["url", "UID", "Title", "SearchableText", "snippetText", "modified"]
    )


def _q_sitemap_frontier(sf_dir: str):
    """Exercises the real sitemap XML writer→parser path (S1-S4):
    documents → urlset XML per batch → Sitemap parse → url_info rows."""
    import pyarrow as pa

    from ftw_crawler_ray.config import Site
    from ftw_crawler_ray.sources.pages import read_frontier
    from ftw_crawler_ray.sources.sitemap import Sitemap, synthesize_sitemap_xml

    site = Site("http://example.org/")

    def roundtrip(batch: pa.Table) -> pa.Table:
        xml = synthesize_sitemap_xml(
            batch["url"].to_pylist(), batch["lastmod"].to_pylist()
        )
        infos = Sitemap(site, xml).url_infos
        return pa.table(
            {
                "url": pa.array([i["loc"] for i in infos], pa.string()),
                "lastmod": pa.array(
                    [i.get("lastmod") for i in infos], pa.string()
                ),
            }
        )

    return read_frontier(sf_dir).map_batches(
        roundtrip, batch_format="pyarrow", batch_size=None
    )


def _q_minhash_dedup(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import minhash_dedup

    return minhash_dedup(sf_dir, threshold=0.5)


def _q_crawl_politeness(sf_dir: str):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ftw_crawler_ray.pipelines.crawl import scheduled_frontier

    sched = scheduled_frontier(sf_dir, num_shards=8)

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["status"], "scheduled"))
        return pa.table(
            {
                "url": t["url"],
                "site_id": t["site_id"],
                "fetch_order": t["fetch_order"],
                "planned_offset": pc.round(t["planned_offset"], ndigits=6),
            }
        )

    return sched.map_batches(project, batch_format="pyarrow", batch_size=None)


def _q_quality_scores(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import quality_scores

    return quality_scores(sf_dir)


def _q_sessionize(sf_dir: str):
    from ftw_crawler_ray.stages.window import sessionize

    return sessionize(sf_dir)


def _q_ann_topk(sf_dir: str):
    from ftw_crawler_ray.stages.similarity import ann_topk

    return ann_topk(sf_dir, query_ids=[0, 1, 2, 3, 4], k=10)


def _q_near_dups(sf_dir: str):
    from ftw_crawler_ray.stages.similarity import near_dup_pairs

    return near_dup_pairs(sf_dir, threshold=0.3)


def _q_lang_id(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import lang_id

    return lang_id(sf_dir)


def _q_fingerprints(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import fingerprints

    return fingerprints(sf_dir)


def _q_pack_sequences(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import pack_sequences

    return pack_sequences(sf_dir)


def _q_corpus_prep(sf_dir: str):
    # quality gate → dedup_clusters over survivors → pack_sequences:
    # the end-to-end pretraining corpus-prep composition
    from ftw_crawler_ray.pipelines.recipe import corpus_prep

    return corpus_prep(sf_dir)


def _q_global_shuffle(sf_dir: str):
    from ftw_crawler_ray.pipelines.recipe import global_shuffle

    return global_shuffle(sf_dir)


def _q_split_dataset(sf_dir: str):
    from ftw_crawler_ray.pipelines.recipe import split_dataset

    return split_dataset(sf_dir)


def _q_embedding_dedup(sf_dir: str):
    # LSH params as in lsh_near_dups (recall 1.0 at the pinned seed,
    # exact verify) → connected components; the exact-SQL component
    # oracle applies for the same reason the pair oracle does
    from ftw_crawler_ray.stages.similarity import embedding_dedup

    return embedding_dedup(sf_dir)


def _q_minhash_pairs(sf_dir: str):
    """Recall-invariant + count-band check of the LSH candidate stage:
    the band hashes are blake2b (not SQL-recomputable), but the
    candidate set's CONTRACT is — it must contain every pair with
    exact word-5-gram Jaccard ≥ 0.8 (rows = verified candidates vs the
    oracle's exhaustive true pairs) and must not blow up past 4× the
    true-pair count (the (-1,-1) sentinel row)."""
    from ftw_crawler_ray.stages.dedup import minhash_candidate_recall_check

    return minhash_candidate_recall_check(sf_dir, threshold=0.8,
                                          band_factor=4)


def _q_minhash_verified(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import minhash_verified_pairs

    return minhash_verified_pairs(sf_dir, threshold=0.8)


def _q_lsh_near_dups(sf_dir: str):
    # 64 bands × 4 planes: per-pair miss probability ~1e-5 at the 0.4
    # threshold — empirically recall 1.0 vs the brute-force twin at
    # sf0.001/sf0.01 with the pinned seed, so the exact-SQL oracle
    # applies (verification makes precision exact by construction)
    from ftw_crawler_ray.stages.similarity import lsh_near_dups

    return lsh_near_dups(sf_dir, threshold=0.4, n_bands=64, planes_per_band=4)


def _q_ivf_topk(sf_dir: str):
    # exhaustive probe (n_probe = n_centroids): the IVF build/probe
    # machinery runs end-to-end (train → partitioned index write →
    # pruned file read → per-cell scan) and the result provably
    # equals exact brute force, so the ann_topk SQL oracle applies.
    # Approximate recall (n_probe < n_centroids) is pinned in pytest.
    from ftw_crawler_ray.stages.similarity import ivf_topk

    return ivf_topk(sf_dir, query_ids=[0, 1, 2, 3, 4], k=10, n_probe=16)


def _q_strip_boilerplate(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import strip_repeated_ngrams

    return strip_repeated_ngrams(sf_dir, k=5, min_docs=2)


def _q_dedup_clusters(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import dedup_clusters

    return dedup_clusters(sf_dir, threshold=0.8)


def _q_training_mix(sf_dir: str):
    from ftw_crawler_ray.pipelines.recipe import training_mix

    return training_mix(sf_dir)


def _q_repeated_ngrams(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import repeated_ngrams

    return repeated_ngrams(sf_dir, k=5, min_docs=2)


def _q_decontaminate(sf_dir: str):
    from ftw_crawler_ray.stages.textstats import decontaminate

    return decontaminate(sf_dir, k=5, modulus=97)


def _q_simhash_pairs(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import simhash_near_dups

    return simhash_near_dups(sf_dir)


def _q_simhash(sf_dir: str):
    from ftw_crawler_ray.stages.dedup import simhash_table

    return simhash_table(sf_dir)


def _q_image_features(sf_dir: str):
    """The full feature stage runs (real PNG/JPEG/GIF header decode +
    FIMG pixel stats + digests); the projection keeps the SQL-
    derivable columns — format, true dims (closed-form media_dims),
    n_pixels = w·h for FIMG rows / NULL for header-only rows. The
    rng-pixel histogram and blake2b digest stay pytest-pinned."""
    import pyarrow as pa

    from ftw_crawler_ray.stages.multimodal import image_features

    # int64 dims on both sides: the driver's value hash is type-sensitive
    return image_features(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "format": t["format"],
                "width": t["width"].combine_chunks().cast(pa.int64()),
                "height": t["height"].combine_chunks().cast(pa.int64()),
                "n_pixels": t["n_pixels"],
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )


def _q_sampled_frames(sf_dir: str):
    import pyarrow as pa

    from ftw_crawler_ray.stages.multimodal import sampled_frames

    # int64 on both sides: the driver's value hash is type-sensitive
    return sampled_frames(sf_dir).map_batches(
        lambda t: pa.table(
            {
                "media_id": t["media_id"],
                "frame_idx": t["frame_idx"].combine_chunks().cast(pa.int64()),
            }
        ),
        batch_format="pyarrow", batch_size=None,
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_pages": _q_extract_pages,
        "frontier_build": _q_frontier_build,
        "frontier_join_index": _q_frontier_join_index,
        "fetch_candidates": _q_fetch_candidates,
        "purge_candidates": _q_purge_candidates,
        "host_stats": _q_host_stats,
        "dedup_exact": _q_dedup_exact,
        "token_count": _q_token_count,
        "token_count_bpe": _q_token_count_bpe,
        "window_events": _q_window_events,
        "topk_per_source": _q_topk_per_source,
        "source_mix": _q_source_mix,
        "sliding_windows": _q_sliding_windows,
        "approx_users": _q_approx_users,
        "crawl_schedule": _q_crawl_schedule,
        "crawl_seen": _q_crawl_seen,
        "crawl_docs": _q_crawl_docs,
        "sitemap_frontier": _q_sitemap_frontier,
        "crawl_politeness": _q_crawl_politeness,
        "quality_scores": _q_quality_scores,
        "sessionize": _q_sessionize,
        "ann_topk": _q_ann_topk,
        "ivf_topk": _q_ivf_topk,
        "near_dups": _q_near_dups,
        "lsh_near_dups": _q_lsh_near_dups,
        "minhash_verified": _q_minhash_verified,
        "lang_id": _q_lang_id,
        "repeated_ngrams": _q_repeated_ngrams,
        "decontaminate": _q_decontaminate,
        "training_mix": _q_training_mix,
        "dedup_clusters": _q_dedup_clusters,
        "strip_boilerplate": _q_strip_boilerplate,
        # rows-only (non-SQL-expressible: cluster labels from LSH
        # collisions, sketch signatures, binary payload plumbing)
        "minhash_dedup": _q_minhash_dedup,
        "fingerprints": _q_fingerprints,
        "pack_sequences": _q_pack_sequences,
        "corpus_prep": _q_corpus_prep,
        "global_shuffle": _q_global_shuffle,
        "embedding_dedup": _q_embedding_dedup,
        "split_dataset": _q_split_dataset,
        "minhash_pairs": _q_minhash_pairs,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "image_features": _q_image_features,
        "sampled_frames": _q_sampled_frames,
    }


# ---------------------------------------------------------------------------
# oracle_sql() — DuckDB equivalents over the registered views
# ---------------------------------------------------------------------------


def oracle_sql() -> dict[str, str]:
    uid = SQL_UID.format(u="url")
    return {
        "extract_pages": f"""
WITH {SQL_RESOURCES}
SELECT
    url,
    {uid} AS "UID",
    'page-' || doc_id AS "getId",
    coalesce(target, url) AS "getRemoteUrl",
    url AS path_string,
    title AS "Title",
    searchable AS "SearchableText",
    CASE WHEN starts_with(searchable, title)
         THEN ltrim(searchable, title) ELSE searchable END AS "snippetText",
    'ContentPage' AS portal_type,
    'CONTENT_PAGE' AS object_type,
    site_id AS site_area,
    coalesce(CAST(lastmod AS TIMESTAMP), TIMESTAMP '2021-01-01') AS created,
    coalesce(CAST(lastmod AS TIMESTAMP), TIMESTAMP '2021-01-01') AS modified,
    TIMESTAMP '2021-01-01' AS effective,
    TIMESTAMP '2050-12-31' AS expires,
    TRUE AS showinsearch
FROM resources
""",
        "frontier_build": f"""
WITH {SQL_RESOURCES}
SELECT url, lastmod, changefreq, priority, target, site_id, seq
FROM resources
""",
        "frontier_join_index": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE}
SELECT r.url, r.lastmod, r.seq, i.last_modified AS last_indexed
FROM resources r LEFT JOIN index_state i ON r.url = i.url
""",
        "fetch_candidates": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE}
SELECT r.url, r.seq
FROM resources r LEFT JOIN index_state i ON r.url = i.url
WHERE i.last_modified IS NULL
   OR r.lastmod IS NULL
   OR CAST(r.lastmod AS TIMESTAMP) > i.last_modified
""",
        "purge_candidates": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE}
SELECT {SQL_UID.format(u="i.url")} AS uid, i.url
FROM index_state i
LEFT JOIN (SELECT DISTINCT lower(url) AS lurl FROM resources) f
       ON lower(i.url) = f.lurl
WHERE f.lurl IS NULL
  AND regexp_matches(i.url, '^http://h[0-9]+\\.example\\.org/')
""",
        "host_stats": f"""
WITH {SQL_RESOURCES}
SELECT site_id, count(*) AS n_pages, min(seq) AS min_seq, max(seq) AS max_seq
FROM resources GROUP BY site_id
""",
        "dedup_exact": """
SELECT md5(text) AS text_md5, min(doc_id) AS keep_doc_id,
       count(*) AS n_dups
FROM documents GROUP BY md5(text)
""",
        "token_count": r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END
           AS n_tokens
FROM documents
""",
        "token_count_bpe": r"""
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+'))
           AS n_bpe_tokens
FROM documents
""",
        "window_events": """
-- cents-exact sum: each value rounds to cents FIRST (identical
-- float op in engine and SQL), the sum is integer-exact, so the
-- result is independent of addition order on both engines
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
""",
        "topk_per_source": """
SELECT doc_id, source, n_chars, rank FROM (
    SELECT doc_id, source, n_chars,
           row_number() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id ASC
           ) - 1 AS rank
    FROM documents
) WHERE rank < 3
""",
        "source_mix": """
SELECT doc_id, source FROM documents
WHERE (doc_id * 2654435761) % 4294967296 % 100
      < (CAST(substr(source, 4) AS BIGINT) * 7 + 10) % 100
""",
        "sliding_windows": """
WITH exploded AS (
    SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
               AS window_start, event_type, value
    FROM events
    UNION ALL
    SELECT CAST(to_timestamp(floor(epoch(ts) / 1800) * 1800) AS TIMESTAMP)
               - INTERVAL 30 MINUTE, event_type, value
    FROM events
)
SELECT window_start, event_type, count(*) AS n_events,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) / 100.0 AS sum_value
FROM exploded GROUP BY 1, 2
""",
        # crawl plan: per-host rank by (priority DESC, lastmod DESC
        # NULLS LAST, seq) over modified ∧ robots-allowed candidates —
        # mirrors FrontierHeap.priority_key + FrontierShard.schedule
        "crawl_schedule": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE},
cand AS (
    SELECT r.* FROM resources r LEFT JOIN index_state i ON r.url = i.url
    WHERE i.last_modified IS NULL OR r.lastmod IS NULL
       OR CAST(r.lastmod AS TIMESTAMP) > i.last_modified
)
SELECT url, site_id,
       row_number() OVER (
           PARTITION BY site_id
           ORDER BY CAST(priority AS DOUBLE) DESC,
                    (lastmod IS NULL) ASC,
                    CAST(lastmod AS TIMESTAMP) DESC,
                    seq ASC
       ) - 1 AS fetch_order
FROM cand
WHERE (doc_id % 41) % 10 <> 3
""",
        "crawl_seen": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE}
SELECT lower(r.url) AS url_seen
FROM resources r LEFT JOIN index_state i ON r.url = i.url
WHERE i.last_modified IS NULL OR r.lastmod IS NULL
   OR CAST(r.lastmod AS TIMESTAMP) > i.last_modified
""",
        "crawl_docs": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE},
cand AS (
    SELECT r.* FROM resources r LEFT JOIN index_state i ON r.url = i.url
    WHERE i.last_modified IS NULL OR r.lastmod IS NULL
       OR CAST(r.lastmod AS TIMESTAMP) > i.last_modified
)
SELECT url,
       {uid} AS "UID",
       title AS "Title",
       searchable AS "SearchableText",
       CASE WHEN starts_with(searchable, title)
            THEN ltrim(searchable, title) ELSE searchable END AS "snippetText",
       coalesce(CAST(lastmod AS TIMESTAMP), TIMESTAMP '2021-01-01') AS modified
FROM cand
WHERE (doc_id % 41) % 10 <> 3
  AND doc_id % 101 <> 0
  AND doc_id % 103 <> 0
""",
        "sitemap_frontier": f"""
WITH {SQL_RESOURCES}
SELECT url, lastmod FROM resources
""",
        # politeness budget parity: virtual-clock token bucket with
        # the reference's 429 rule (sleep at current sleeptime per
        # 429; double only when the retry 429s AGAIN —
        # fetcher.py:60-66). The sandbox injects at most one 429 per
        # fetch, so sleeptime never doubles: s = 0.1 constant, each
        # fetch j advances the host clock by s*(1 + [429_j]) and a
        # 429-fetch starts s late:
        # t_i = Σ_{j<i} s*(1+[429_j]) + s*[429_i]
        "crawl_politeness": f"""
WITH {SQL_RESOURCES}, {SQL_INDEX_STATE},
cand AS (
    SELECT r.* FROM resources r LEFT JOIN index_state i ON r.url = i.url
    WHERE i.last_modified IS NULL OR r.lastmod IS NULL
       OR CAST(r.lastmod AS TIMESTAMP) > i.last_modified
),
sched AS (
    SELECT url, site_id, doc_id,
           CASE WHEN doc_id % 97 = 0 THEN 1 ELSE 0 END AS is429,
           row_number() OVER (
               PARTITION BY site_id
               ORDER BY CAST(priority AS DOUBLE) DESC,
                        (lastmod IS NULL) ASC,
                        CAST(lastmod AS TIMESTAMP) DESC,
                        seq ASC
           ) - 1 AS fetch_order
    FROM cand WHERE (doc_id % 41) % 10 <> 3
)
SELECT url, site_id, fetch_order,
       round(0.1 * (coalesce(sum(1 + is429) OVER (
                 PARTITION BY site_id ORDER BY fetch_order
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + is429), 6) AS planned_offset
FROM sched
""",
        "quality_scores": r"""
WITH toks AS (
    SELECT doc_id,
           length(text) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')) END AS n_tokens,
           length(regexp_replace(text, '\s', '', 'g')) AS word_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(list_distinct(regexp_split_to_array(trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))) END AS n_distinct
    FROM documents)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE (word_chars * 1000) // n_tokens END AS mean_token_len_x1000,
       CASE WHEN n_tokens = 0 THEN 0
            ELSE (n_distinct * 1000) // n_tokens END AS distinct_ratio_x1000
FROM toks
""",
        "sessionize": """
WITH lagged AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sessions AS (
    -- CAST: DuckDB's window sum(int) is HUGEINT -> pandas float64;
    -- the driver's value hash is type-sensitive, the engine emits int64
    SELECT user_id, ts,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT)
               AS session_id
    FROM lagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM sessions GROUP BY user_id, session_id
""",
        # double-cast: DuckDB computes list_cosine_similarity in the
        # element type; float32 would disagree with the engine's
        # float64 kernel at the 6dp rounding boundary
        "ann_topk": """
WITH q AS (
    SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
sims AS (
    SELECT q.qid AS query_id, e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS sim
    FROM embeddings e CROSS JOIN q
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) - 1 AS rank
    FROM sims
)
SELECT query_id, vec_id, rank, sim FROM ranked WHERE rank < 10
""",
        # exhaustive-probe IVF == exact brute force (see _q_ivf_topk)
        "ivf_topk": """
WITH q AS (
    SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
    FROM embeddings WHERE vec_id IN (0, 1, 2, 3, 4)
),
sims AS (
    SELECT q.qid AS query_id, e.vec_id,
           round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe), 6) AS sim
    FROM embeddings e CROSS JOIN q
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, vec_id ASC) - 1 AS rank
    FROM sims
)
SELECT query_id, vec_id, rank, sim FROM ranked WHERE rank < 10
""",
        "near_dups": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.3
""",
        # LSH recall is exactly 1.0 on this corpus at these pinned
        # parameters (seed 42, 64×4 banding, threshold 0.4) and
        # verification is exact, so the bucketed pipeline's output
        # equals the full pairwise scan (both threshold the 6dp-
        # rounded similarity, like near_dups)
        "lsh_near_dups": """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.4
""",
        # exact word-5-gram Jaccard over re-derived shingle SETS —
        # the engine hashes grams (rolling 64-bit) but Jaccard over
        # hash sets equals Jaccard over the gram strings themselves
        # (collision probability ~2^-64); LSH banding at 64 perms /
        # 16 bands has per-pair miss ~2e-4 at j=0.8 and recall 1.0
        # on this corpus, verification is exact
        # recall invariant of the LSH candidate stage: every exact-
        # Jaccard-≥0.8 pair must be a candidate (the Ray side emits
        # the verified candidates, so equality ⇔ oracle_pairs EXCEPT
        # candidates = ∅), plus the always-true count-band sentinel
        # the Ray side only emits when n_candidates stays within 4×
        # of the true-pair count
        "minhash_pairs": f"""
WITH {SQL_MINHASH_GRAMS}
SELECT doc_a, doc_b FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= 0.8
UNION ALL SELECT -1 AS doc_a, -1 AS doc_b
""",
        "minhash_verified": f"""
WITH {SQL_MINHASH_GRAMS}
SELECT doc_a, doc_b,
       round(ninter * 1.0 / (sa.n + sb.n - ninter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.doc_a
JOIN sizes sb ON sb.doc_id = inter.doc_b
WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= 0.8
""",
        # connected components of the verified-pair graph via
        # recursive reachability: cluster_id = min doc_id reachable —
        # the SQL twin of the engine's distributed min-label
        # propagation (stages/dedup.connected_components)
        "minhash_dedup": f"""
WITH RECURSIVE {SQL_MINHASH_GRAMS},
verified AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= 0.8
),
edges AS (
    SELECT doc_a AS s, doc_b AS d FROM verified
    UNION ALL SELECT doc_b, doc_a FROM verified
),
reach(node, r) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
""",
        # image fixture-table oracle: the media corpus embeds REAL
        # PNG/JPEG/GIF containers (doc_id % 5 ∈ {0,1,2}) whose header
        # dims are the closed-form media_dims(doc_id); FIMG rows
        # (% 5 ∈ {3,4}) carry full pixel stats so n_pixels = w·h,
        # header-only rows NULL (no pixel decode without an image lib)
        "image_features": """
WITH dims AS (
    SELECT doc_id,
           16 + (doc_id * 2654435761) % 4294967296 % 48 AS width,
           16 + (doc_id * 40503) % 65536 % 48 AS height
    FROM documents
)
SELECT doc_id AS media_id,
       CASE doc_id % 5 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
            WHEN 2 THEN 'gif' ELSE 'fimg' END AS format,
       width, height,
       CASE WHEN doc_id % 5 > 2 THEN width * height END AS n_pixels
FROM dims
""",
        # FrameSampler explode plumbing: every 2nd of the 8 fake
        # frames per video → frame_idx {0,2,4,6} per media row (the
        # frame bytes themselves are RNG-derived, so the driver query
        # projects to the SQL-derivable columns)
        "sampled_frames": """
SELECT doc_id AS media_id,
       CAST(unnest([0, 2, 4, 6]) AS BIGINT) AS frame_idx
FROM documents
""",
        # boilerplate detector: word 5-grams in ≥2 distinct docs
        # (sets is DISTINCT per doc, so count(*) = document count)
        "repeated_ngrams": f"""
WITH {SQL_MINHASH_GRAMS}
SELECT gram, count(*) AS n_docs
FROM sets GROUP BY gram HAVING count(*) >= 2
""",
        # benchmark decontamination: non-needle docs sharing ≥1 word
        # 5-gram with the needle set (doc_id % 97 == 0)
        "decontaminate": f"""
WITH {SQL_MINHASH_GRAMS},
needles AS (SELECT DISTINCT gram FROM sets WHERE doc_id % 97 = 0)
SELECT s.doc_id, count(*) AS n_hits
FROM sets s JOIN needles n ON s.gram = n.gram
WHERE s.doc_id % 97 <> 0
GROUP BY s.doc_id
""",
        # boilerplate removal: words covered by any ≥2-doc 5-gram are
        # dropped (1-based gram positions cover i..i+4; short docs'
        # single whole-text gram covers everything)
        "strip_boilerplate": r"""
WITH words AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS w
    FROM documents
),
grams AS (
    SELECT doc_id, w,
           CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(range(1, len(w) - 3),
                                    i -> array_to_string(w[i:i+4], ' '))
           END AS gs
    FROM words
),
sets AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
hot AS (SELECT gram FROM sets GROUP BY gram HAVING count(*) >= 2),
pos AS (
    SELECT g.doc_id AS pdoc, unnest(g.gs) AS gram,
           generate_subscripts(g.gs, 1) AS i, len(g.w) AS nw
    FROM grams g
),
covered AS (
    SELECT DISTINCT p.pdoc AS cdoc,
           unnest(CASE WHEN p.nw < 5 THEN range(1, p.nw + 1)
                       ELSE range(p.i, p.i + 5) END) AS idx
    FROM pos p JOIN hot h ON p.gram = h.gram
),
cov_lists AS (
    SELECT cdoc, list(idx) AS cov FROM covered GROUP BY cdoc
)
SELECT w.doc_id,
       coalesce(array_to_string(
           list_filter(w.w, (x, i) -> cov.cov IS NULL
                                     OR NOT list_contains(cov.cov, i)), ' '),
           '') AS clean_text,
       coalesce(len(cov.cov), 0) AS n_removed
FROM words w LEFT JOIN cov_lists cov ON cov.cdoc = w.doc_id
""",
        # production dedup composition: components over exact-dup
        # edges (md5 keeper → member) ∪ near-dup edges among KEEPERS
        # (exact word-5-gram Jaccard ≥ 0.8, keeper-restricted grams)
        "dedup_clusters": r"""
WITH RECURSIVE md5g AS (SELECT doc_id, md5(text) AS h FROM documents),
ek AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS keeper FROM md5g),
exact_edges AS (
    SELECT keeper AS doc_a, doc_id AS doc_b FROM ek WHERE doc_id <> keeper
),
keeperset AS (SELECT DISTINCT keeper AS doc_id FROM ek),
words AS (
    SELECT d.doc_id,
           list_filter(regexp_split_to_array(d.text, '\s+'), w -> w <> '') AS w
    FROM documents d JOIN keeperset kk ON kk.doc_id = d.doc_id
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(range(1, len(w) - 3),
                                    i -> array_to_string(w[i:i+4], ' '))
           END AS gs
    FROM words
),
sets AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
    FROM sets a JOIN sets b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
verified AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= 0.8
),
edges AS (
    SELECT doc_a AS s, doc_b AS d FROM exact_edges
    UNION ALL SELECT doc_b, doc_a FROM exact_edges
    UNION ALL SELECT doc_a, doc_b FROM verified
    UNION ALL SELECT doc_b, doc_a FROM verified
),
reach(node, r) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node
)
SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node
""",
        # the composite recipe: quality bounds ∧ language ∧ not
        # contaminated ∧ deterministic source mix — each predicate is
        # the SAME formula as its standalone oracle
        "training_mix": r"""
WITH words AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '') AS w
    FROM documents
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(range(1, len(w) - 3),
                                    i -> array_to_string(w[i:i+4], ' '))
           END AS gs
    FROM words
),
sets AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
needles AS (SELECT DISTINCT gram FROM sets WHERE doc_id % 97 = 0),
contaminated AS (
    SELECT DISTINCT s.doc_id FROM sets s JOIN needles n ON s.gram = n.gram
    WHERE s.doc_id % 97 <> 0
),
lwords AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents
),
lhits AS (
    SELECT doc_id,
        sum(CASE WHEN w IN ('the','and','of','to','a','in','is','it','you','that')
                 THEN 1 ELSE 0 END) AS en,
        sum(CASE WHEN w IN ('der','die','das','und','ist','nicht','ein','mit','zu','den')
                 THEN 1 ELSE 0 END) AS de,
        sum(CASE WHEN w IN ('le','la','les','et','est','un','une','des','que','pas')
                 THEN 1 ELSE 0 END) AS fr
    FROM lwords GROUP BY doc_id
),
scored AS (
    SELECT d.doc_id, d.source,
           CASE WHEN coalesce(h.en, 0) = 0 AND coalesce(h.de, 0) = 0
                     AND coalesce(h.fr, 0) = 0 THEN 'unknown'
                WHEN h.en >= h.de AND h.en >= h.fr THEN 'en'
                WHEN h.de >= h.fr THEN 'de'
                ELSE 'fr' END AS lang_pred,
           CASE WHEN trim(d.text) = '' THEN 0
                ELSE len(regexp_split_to_array(
                         trim(regexp_replace(d.text, '\s+', ' ', 'g')), ' '))
           END AS n_tokens
    FROM documents d LEFT JOIN lhits h ON h.doc_id = d.doc_id
)
SELECT doc_id, source, lang_pred, n_tokens
FROM scored
WHERE doc_id % 97 <> 0
  AND doc_id NOT IN (SELECT doc_id FROM contaminated)
  AND n_tokens BETWEEN 40 AND 2000
  AND lang_pred IN ('en', 'de', 'fr')
  AND (doc_id * 2654435761) % 4294967296 % 100
      < (CAST(substr(source, 4) AS BIGINT) * 7 + 10) % 100
""",
        # stopword-profile language id: argmax of per-language stopword
        # hits, ties resolved en > de > fr (the engine's dict order
        # with strict >), all-zero → unknown
        "lang_id": r"""
WITH words AS (
    SELECT doc_id,
           unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
                              x -> x <> '')) AS w
    FROM documents
),
hits AS (
    SELECT doc_id,
        sum(CASE WHEN w IN ('the','and','of','to','a','in','is','it','you','that')
                 THEN 1 ELSE 0 END) AS en,
        sum(CASE WHEN w IN ('der','die','das','und','ist','nicht','ein','mit','zu','den')
                 THEN 1 ELSE 0 END) AS de,
        sum(CASE WHEN w IN ('le','la','les','et','est','un','une','des','que','pas')
                 THEN 1 ELSE 0 END) AS fr
    FROM words GROUP BY doc_id
)
SELECT d.doc_id, d.lang,
       CASE WHEN coalesce(h.en, 0) = 0 AND coalesce(h.de, 0) = 0
                 AND coalesce(h.fr, 0) = 0 THEN 'unknown'
            WHEN h.en >= h.de AND h.en >= h.fr THEN 'en'
            WHEN h.de >= h.fr THEN 'de'
            ELSE 'fr' END AS lang_pred
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
""",
        # SimHash recomputed bit-for-bit in SQL: md5-prefix word hash
        # (engine: dedup._word_hash_md5), ±1 majority vote per bit.
        # UBIGINT casts keep pandas dtype uint64 = the engine's column.
        "simhash": SQL_SIMHASH_SIG + r"""
SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash,
       CAST(coalesce(s.simhash, CAST(0 AS UBIGINT)) >> 48 AS UINTEGER)
           AS bucket
FROM documents d LEFT JOIN sig s USING (doc_id)
""",
        # Pair oracle is EXACT, not approximate: with 8 rotations of a
        # 16-bit prefix window (step 8), every bit lies in exactly 2
        # windows, so ≤ 3 differing bits kill ≤ 6 of 8 windows — a
        # clean window always survives and the engine's bucketed pair
        # gen has guaranteed recall at radius 3. O(n²) here is the
        # oracle's cost, not the engine's.
        "simhash_pairs": SQL_SIMHASH_SIG + r"""
, full_sig AS (
    SELECT d.doc_id, coalesce(s.simhash, CAST(0 AS UBIGINT)) AS simhash
    FROM documents d LEFT JOIN sig s USING (doc_id)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM full_sig a JOIN full_sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""",
        # Greedy first-fit packing IS SQL-expressible per packer
        # partition: a recursive CTE threads the running fill through
        # doc_id order. The HUGEINT product is congruent mod 256 to
        # the engine's uint64-wrapped Knuth hash (256 | 2^64).
        "pack_sequences": r"""
WITH RECURSIVE toks AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(
                         trim(regexp_replace(text, '\s+', ' ', 'g')), ' '))
           END AS n_tokens,
           CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 256 AS INTEGER)
               AS part
    FROM documents
),
ordered AS (
    SELECT doc_id, n_tokens, part,
           row_number() OVER (PARTITION BY part ORDER BY doc_id) AS rn
    FROM toks
),
packed AS (
    SELECT part, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS seq,
           CAST(0 AS BIGINT) AS seq_offset,
           CAST(n_tokens AS BIGINT) AS fill_after
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.part, o.rn, o.doc_id, o.n_tokens,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN p.seq + 1 ELSE p.seq END,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN CAST(0 AS BIGINT) ELSE p.fill_after END,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN CAST(o.n_tokens AS BIGINT)
                ELSE p.fill_after + o.n_tokens END
    FROM packed p JOIN ordered o ON o.part = p.part AND o.rn = p.rn + 1
)
SELECT doc_id, part,
       CAST(part AS BIGINT) * 4294967296 + seq AS seq_id,
       seq_offset, CAST(n_tokens AS BIGINT) AS n_tokens
FROM packed
""",
        # Winnowing fingerprint recomputed bit-for-bit: md5-prefix
        # uint64 per word 3-gram string (engine:
        # textstats._gram_hashes_md5; empty text → sentinel hash 0),
        # min per 8-consecutive-shingle window (the engine pads the
        # tail window with uint64-max, which never wins a min — SQL
        # just mins over what's there), final digest = md5 over the
        # minima as lowercase 16-hex-digit words in window order.
        "fingerprints": r"""
WITH fw AS (
    SELECT doc_id,
           CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array(
                    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
           END AS ws
    FROM documents
),
fg AS (
    SELECT doc_id, len(ws) AS n,
           unnest(generate_series(
               1, greatest(len(ws) - least(3, len(ws)) + 1, 1))) AS i,
           ws
    FROM fw WHERE len(ws) > 0
),
fh AS (
    SELECT doc_id, i,
           CAST(concat('0x', substr(md5(
               array_to_string(ws[i:i + least(3, n) - 1], ' ')), 1, 16))
               AS UBIGINT) AS g
    FROM fg
),
allh AS (
    SELECT doc_id, i, g FROM fh
    UNION ALL
    SELECT doc_id, 1 AS i, CAST(0 AS UBIGINT) AS g
    FROM fw WHERE len(ws) = 0
),
wmins AS (
    SELECT doc_id, (i - 1) // 8 AS w, min(g) AS mn
    FROM allh GROUP BY 1, 2
)
SELECT doc_id,
       CAST(concat('0x', substr(md5(
           string_agg(lower(lpad(to_hex(mn), 16, '0')), '' ORDER BY w)
       ), 1, 16)) AS UBIGINT) AS fingerprint
FROM wmins GROUP BY doc_id
""",
        # HyperLogLog estimate recomputed exactly, not bounds-checked:
        # md5-prefix item hash (engine: sketches.HyperLogLog.add over
        # str(user_id)), register = top-12 hash bits, rank = 53 −
        # bit_length of the low 52 bits (bin()/ltrim is EXACT — a
        # float log2 misrounds within ulps of 2^52). Registers never
        # seen stay 0, so Σ2^-rank gains (4096 − cnt)·2⁰ and the
        # linear-counting zeros term is 4096 − cnt. The merge order
        # the engine uses is irrelevant: max() is the register
        # combiner, so registers — and the estimate — are
        # order-independent.
        "approx_users": r"""
WITH uh AS (
    SELECT event_type,
           CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 16))
               AS UBIGINT) AS h
    FROM events
),
regs AS (
    SELECT event_type, h >> 52 AS idx,
           max(53 - length(ltrim(bin(h & ((CAST(1 AS UBIGINT) << 52) - 1)),
                                 '0'))) AS rank
    FROM uh GROUP BY 1, 2
),
est AS (
    SELECT event_type,
           count(*) AS cnt,
           (0.7213 / (1 + 1.079 / 4096)) * 4096.0 * 4096.0
               / ((4096 - count(*)) + sum(pow(2.0, -rank))) AS raw
    FROM regs GROUP BY 1
)
SELECT event_type,
       CAST(round(CASE WHEN raw <= 2.5 * 4096 AND cnt < 4096
                       THEN 4096.0 * ln(4096.0 / (4096 - cnt))
                       ELSE raw END) AS BIGINT) AS approx_users
FROM est
""",
        # the end-to-end corpus-prep composition: each stage is the
        # SAME formula as its standalone oracle — quality_scores'
        # integer gates, dedup_clusters' exact ∪ Jaccard-verified
        # components (restricted to quality survivors), and
        # pack_sequences' recursive running-fill CTE (restricted to
        # cluster representatives)
        "corpus_prep": r"""
WITH RECURSIVE qd AS (
    SELECT doc_id, text,
           CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array(
                    trim(regexp_replace(text, '\s+', ' ', 'g')), ' ')
           END AS ws
    FROM documents
),
fdocs AS (
    SELECT doc_id, text, len(ws) AS n_tokens
    FROM qd
    WHERE len(ws) >= 25
      AND len(list_distinct(ws)) * 1000 // len(ws) >= 400
),
md5g AS (SELECT doc_id, md5(text) AS h FROM fdocs),
ek AS (SELECT doc_id, min(doc_id) OVER (PARTITION BY h) AS keeper FROM md5g),
exact_edges AS (
    SELECT keeper AS doc_a, doc_id AS doc_b FROM ek WHERE doc_id <> keeper
),
keeperset AS (SELECT DISTINCT keeper AS doc_id FROM ek),
words AS (
    SELECT d.doc_id,
           list_filter(regexp_split_to_array(d.text, '\s+'), w -> w <> '') AS w
    FROM fdocs d JOIN keeperset kk ON kk.doc_id = d.doc_id
),
grams AS (
    SELECT doc_id,
           CASE WHEN len(w) < 5 THEN [array_to_string(w, ' ')]
                ELSE list_transform(range(1, len(w) - 3),
                                    i -> array_to_string(w[i:i+4], ' '))
           END AS gs
    FROM words
),
sets AS (SELECT DISTINCT doc_id, unnest(gs) AS gram FROM grams),
sizes AS (SELECT doc_id, count(*) AS n FROM sets GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
    FROM sets a JOIN sets b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
verified AS (
    SELECT doc_a, doc_b FROM inter
    JOIN sizes sa ON sa.doc_id = inter.doc_a
    JOIN sizes sb ON sb.doc_id = inter.doc_b
    WHERE ninter * 1.0 / (sa.n + sb.n - ninter) >= 0.8
),
edges AS (
    SELECT doc_a AS s, doc_b AS d FROM exact_edges
    UNION ALL SELECT doc_b, doc_a FROM exact_edges
    UNION ALL SELECT doc_a, doc_b FROM verified
    UNION ALL SELECT doc_b, doc_a FROM verified
),
reach(node, r) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node
),
clusters AS (SELECT node AS doc_id, min(r) AS cluster_id FROM reach GROUP BY node),
survivors AS (
    SELECT f.doc_id, f.n_tokens
    FROM fdocs f LEFT JOIN clusters c USING (doc_id)
    WHERE c.cluster_id IS NULL OR c.cluster_id = f.doc_id
),
toks AS (
    SELECT doc_id, n_tokens,
           CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 256 AS INTEGER)
               AS part
    FROM survivors
),
ordered AS (
    SELECT doc_id, n_tokens, part,
           row_number() OVER (PARTITION BY part ORDER BY doc_id) AS rn
    FROM toks
),
packed AS (
    SELECT part, rn, doc_id, n_tokens,
           CAST(0 AS BIGINT) AS seq,
           CAST(0 AS BIGINT) AS seq_offset,
           CAST(n_tokens AS BIGINT) AS fill_after
    FROM ordered WHERE rn = 1
    UNION ALL
    SELECT o.part, o.rn, o.doc_id, o.n_tokens,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN p.seq + 1 ELSE p.seq END,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN CAST(0 AS BIGINT) ELSE p.fill_after END,
           CASE WHEN p.fill_after > 0 AND p.fill_after + o.n_tokens > 512
                THEN CAST(o.n_tokens AS BIGINT)
                ELSE p.fill_after + o.n_tokens END
    FROM packed p JOIN ordered o ON o.part = p.part AND o.rn = p.rn + 1
)
SELECT doc_id, part,
       CAST(part AS BIGINT) * 4294967296 + seq AS seq_id,
       seq_offset, CAST(n_tokens AS BIGINT) AS n_tokens
FROM packed
""",
        # deterministic write-side shuffle: Knuth hash position,
        # rank within shard — the reproducible, resume-safe
        # alternative to a materializing random_shuffle
        "global_shuffle": r"""
WITH hpos AS (
    SELECT doc_id,
           CAST((CAST(doc_id AS HUGEINT) * 2654435761) % 4294967296
               AS BIGINT) AS h
    FROM documents
)
SELECT doc_id, CAST(h % 16 AS INTEGER) AS shard,
       row_number() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1
           AS pos
FROM hpos
""",
        # vector-side dedup clusters: recursive reachability over the
        # exact cosine near-dup edges (same threshold as the
        # lsh_near_dups oracle) — cluster_id = min reachable vec_id
        "embedding_dedup": """
WITH RECURSIVE nd AS (
    SELECT a.vec_id AS va, b.vec_id AS vb
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6)
          >= 0.4
),
edges AS (
    SELECT va AS s, vb AS d FROM nd
    UNION ALL SELECT vb, va FROM nd
),
reach(node, r) AS (
    SELECT s, s FROM edges
    UNION
    SELECT e.s, reach.r FROM edges e JOIN reach ON e.d = reach.node
)
SELECT node AS vec_id, min(r) AS cluster_id FROM reach GROUP BY node
""",
        # stratified-by-construction split: salted Knuth hash (+1 on
        # the id decorrelates from training_mix's unsalted sampling
        # hash), uniform within every source
        "split_dataset": """
SELECT doc_id, source,
       CASE WHEN ((doc_id + 1) * 2654435761) % 4294967296 % 100 >= 95
                THEN 'test'
            WHEN ((doc_id + 1) * 2654435761) % 4294967296 % 100 >= 90
                THEN 'val'
            ELSE 'train' END AS split
FROM documents
""",
    }
