"""Property-based tests (hypothesis) for the hot kernels."""

from hypothesis import given, settings
from hypothesis import strategies as st

from ftw_crawler_ray.functions.markup import (
    find_nodes,
    first_node_text,
    parse_html,
    text_content,
)
from ftw_crawler_ray.functions.textutils import lstrip_charset, normalize_whitespace
from ftw_crawler_ray.functions.urlnorm import slugify, uid_for_url
from ftw_crawler_ray.state.filters import BloomFilter, CuckooFilter

text_st = st.text(max_size=200)


class TestNormalizeWhitespaceProps:
    @given(text_st)
    def test_idempotent(self, s):
        once = normalize_whitespace(s)
        assert normalize_whitespace(once) == once

    @given(text_st)
    def test_no_runs_no_edges(self, s):
        out = normalize_whitespace(s)
        assert "  " not in out
        assert out == out.strip()

    @given(text_st)
    def test_matches_reference_formula(self, s):
        assert normalize_whitespace(s) == " ".join(s.split())


class TestLstripCharsetProps:
    @given(text_st, st.text(min_size=1, max_size=20))
    def test_is_python_lstrip_when_prefix_matches(self, s, prefix):
        out = lstrip_charset(s, prefix)
        if s.startswith(prefix):
            assert out == s.lstrip(prefix)
        else:
            assert out == s

    @given(text_st, st.text(min_size=1, max_size=20))
    def test_result_is_suffix(self, s, prefix):
        assert s.endswith(lstrip_charset(s, prefix))


class TestUrlKernelProps:
    @given(st.text(min_size=1, max_size=100))
    def test_uid_shape_and_determinism(self, url):
        uid = uid_for_url(url)
        assert uid == uid_for_url(url)
        parts = uid.split("-")
        assert [len(p) for p in parts] == [8, 4, 4, 4, 12]

    @given(st.text(max_size=100))
    def test_slug_charset(self, s):
        slug = slugify(s)
        assert all(c.islower() or c.isdigit() or c == "-" for c in slug)
        assert not slug.startswith("-") and not slug.endswith("-")

    @settings(deadline=None)  # first call pays Arrow kernel warm-up
    @given(st.lists(
        st.one_of(
            st.just(None),
            # generated url: scheme + host + path from a charset that
            # covers both the Arrow fast path and every fallback
            # trigger (%, +, ?, #, whitespace, unicode, no scheme)
            st.builds(
                lambda scheme, host, path: f"{scheme}{host}{path}",
                st.sampled_from(["http://", "HTTPS://", "ftp://", "", "//"]),
                st.text(
                    alphabet="abXY09.-:@", min_size=0, max_size=12
                ),
                st.text(
                    alphabet="/abYZ09._-%+?#= \tä€", min_size=0, max_size=24
                ),
            ),
        ),
        max_size=30,
    ))
    def test_slug_batch_equals_scalar(self, urls):
        """slugs_for_urls == [slug_from_url(u)] for arbitrary junk —
        the Arrow fast path may only ever be a shortcut."""
        from ftw_crawler_ray.functions.urlnorm import (
            slug_from_url, slugs_for_urls,
        )

        expected = [
            slug_from_url(u) if u is not None else None for u in urls
        ]
        assert slugs_for_urls(urls) == expected


# well-formed html fragment strategy
_tag = st.sampled_from(["div", "p", "h1", "span", "b"])


@st.composite
def html_fragment(draw, depth=0):
    n = draw(st.integers(1, 3))
    parts = []
    for _ in range(n):
        tag = draw(_tag)
        attr = draw(st.sampled_from(["", " id='content'", " class='x'"]))
        if depth >= 2 or draw(st.booleans()):
            body = draw(st.text(alphabet="abc XYZ", max_size=12))
        else:
            body = draw(html_fragment(depth=depth + 1))
        parts.append(f"<{tag}{attr}>{body}</{tag}>")
    return "".join(parts)


class TestScannerEquivalence:
    @settings(max_examples=60, deadline=None)
    @given(html_fragment(), st.sampled_from(
        ["//div[@id='content']/h1", "//p", "//h1", "//span"]))
    def test_fast_path_equals_full_parse(self, html, xpath):
        body = html.encode()
        fast = first_node_text(body, xpath)
        nodes = find_nodes(parse_html(body), xpath)
        full = text_content(nodes[0]) if nodes else None
        assert fast == full


class TestFilterProps:
    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1,
                    max_size=200, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_cuckoo_no_false_negatives(self, keys):
        f = CuckooFilter(max(1024, len(keys) * 2))
        for k in keys:
            f.add(k)
        assert all(k in f for k in keys)
        g = CuckooFilter.from_bytes(f.to_bytes())
        assert all(k in g for k in keys)

    @given(st.lists(st.text(min_size=1, max_size=30), min_size=1,
                    max_size=200, unique=True))
    @settings(max_examples=30, deadline=None)
    def test_bloom_no_false_negatives(self, keys):
        f = BloomFilter(max(256, len(keys) * 2))
        for k in keys:
            f.add(k)
        assert all(k in f for k in keys)


class TestShingleProps:
    @given(st.lists(st.sampled_from("alpha beta gamma delta eps zeta".split()),
                    min_size=0, max_size=40))
    @settings(max_examples=200, deadline=None)
    def test_rolling_shingle_equals_gram_identity(self, words):
        """Two positions get the same rolling-shingle hash iff their
        k-word grams are identical (64-bit collisions aside) — the
        property the whole minhash family rests on."""
        from ftw_crawler_ray.stages.dedup import shingles

        k = 3
        text = " ".join(words)
        hashes = shingles(text, k).tolist()
        if not words:
            assert hashes == [0]
            return
        kk = min(k, len(words))
        grams = [" ".join(words[i:i + kk])
                 for i in range(len(words) - kk + 1)]
        assert len(hashes) == len(grams)
        for i in range(len(grams)):
            for j in range(i + 1, len(grams)):
                assert (hashes[i] == hashes[j]) == (grams[i] == grams[j])

    @given(st.text(max_size=120), st.text(max_size=120))
    @settings(max_examples=150, deadline=None)
    def test_jaccard_bounds_and_symmetry(self, a, b):
        from ftw_crawler_ray.stages.dedup import jaccard

        j = jaccard(a, b)
        assert 0.0 <= j <= 1.0
        assert j == jaccard(b, a)
        assert jaccard(a, a) == 1.0

    @given(st.lists(st.integers(min_value=0, max_value=2**64 - 1),
                    min_size=0, max_size=50))
    @settings(max_examples=150, deadline=None)
    def test_minhash_signature_range_and_permutation_invariance(self, vals):
        """Signature values stay < p and are invariant under input
        ORDER (min over a set)."""
        import numpy as np

        from ftw_crawler_ray.stages.dedup import (
            _P31,
            _perm_params,
            minhash_signature,
        )

        a, b = _perm_params(8)
        sh = np.array(vals, dtype=np.uint64)
        sig = minhash_signature(sh, a, b)
        assert (sig <= _P31).all()
        rng = np.random.default_rng(0)
        perm = rng.permutation(len(sh)) if len(sh) else []
        sig2 = minhash_signature(sh[perm] if len(sh) else sh, a, b)
        assert (sig == sig2).all()
