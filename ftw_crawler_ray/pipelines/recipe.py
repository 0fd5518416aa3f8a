"""Training-data recipe — the composition showpiece: one streaming
filter chain turning a raw document table into a training mix.

    documents ──► quality bounds (token count)
              ──► language id (stopword argmax)
              ──► benchmark decontamination (needle-gram overlap)
              ──► weighted deterministic source mix
              ──► (doc_id, source, lang_pred, n_tokens)

Every step is doc-wise, so the WHOLE recipe is one ``map_batches``
actor chain with a single broadcast (the needle gram-hash set) and
ZERO shuffles — the shape a 100 TB filter pass must have. Each
ingredient is independently oracle-checked elsewhere
(quality_scores, lang_id, decontaminate, source_mix); the composite
has its own SQL oracle assembled from the same formulas.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..stages.util import sized_read_parquet

from ..stages.textstats import LangId, _needle_gram_hashes


def training_mix(
    sf_dir: str,
    min_tokens: int = 40,
    max_tokens: int = 2000,
    keep_langs: tuple = ("en", "de", "fr"),
    contamination_modulus: int = 97,
    shingle_k: int = 5,
) -> ray.data.Dataset:
    needles_ref = _needle_gram_hashes.remote(
        f"{sf_dir}/documents.parquet", shingle_k, contamination_modulus
    )
    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    langs = frozenset(keep_langs)

    class RecipeFilter:
        def __init__(self):
            from ..stages.dedup import MinHasher

            self.langid = LangId()
            self.needles = None
            self.cache: dict[str, int] = {}
            self._cache_limit = MinHasher._CACHE_LIMIT

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..stages.dedup import shingles

            if self.needles is None:
                self.needles = ray.get(needles_ref)
            if len(self.cache) > self._cache_limit:
                self.cache.clear()
            ids, srcs, preds, toks = [], [], [], []
            for doc_id, text, source in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist(),
                batch["source"].to_pylist(),
            ):
                if doc_id % contamination_modulus == 0:
                    continue  # the benchmark itself never trains
                n_tokens = len(text.split())
                if not (min_tokens <= n_tokens <= max_tokens):
                    continue
                lang = self.langid.classify(text)
                if lang not in langs:
                    continue
                if set(shingles(text, shingle_k, self.cache).tolist()) \
                        & self.needles:
                    continue  # contaminated
                weight = (int(source[3:]) * 7 + 10) % 100
                if (doc_id * 2654435761) % 4294967296 % 100 >= weight:
                    continue  # deterministic mix
                ids.append(doc_id)
                srcs.append(source)
                preds.append(lang)
                toks.append(n_tokens)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "source": pa.array(srcs, pa.string()),
                    "lang_pred": pa.array(preds, pa.string()),
                    "n_tokens": pa.array(toks, pa.int64()),
                }
            )

    return docs.map_batches(
        RecipeFilter, batch_format="pyarrow", batch_size=None,
        concurrency=(1, 4),
    )
