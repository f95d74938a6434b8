"""Index structure white-box tests.

Re-targets the reference's trie-structure unit tests
(`/root/reference/src/index.rs:454-785`) at this engine's data model: the
sorted term table and CSR postings replace node/char layout assertions, but
the observable invariants (field stats, term membership, posting contents,
vacuum emptiness, NaN average) are identical.
"""

import math
from dataclasses import dataclass

import numpy as np

from probly_search_tpu import Index
from .util import tokenizer


@dataclass
class Doc:
    id: int
    text: str


def field_accessor(doc):
    return [doc.text]


def test_add_one_document_with_three_terms():
    # index.rs:497-545 — one doc "a b c".
    index = Index(1)
    doc = Doc(id=1, text="a b c")
    index.add_document([field_accessor], tokenizer, doc.id, doc)

    assert len(index.docs) == 1
    details = index.docs[1]
    assert details.key == 1
    assert list(details.field_length) == [3]
    assert index.fields[0].sum == 3
    assert index.fields[0].avg == 3.0

    assert index.terms() == ["a", "b", "c"]
    for t in ("a", "b", "c"):
        assert index.document_frequency(t) == 1


def test_add_shared_terms():
    # index.rs:548-604 — "a b c" + "b c d" share terms.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="a b c"))
    index.add_document([field_accessor], tokenizer, 2, Doc(id=2, text="b c d"))

    assert len(index.docs) == 2
    assert list(index.docs[1].field_length) == [3]
    assert list(index.docs[2].field_length) == [3]
    assert index.fields[0].sum == 6
    assert index.fields[0].avg == 3.0
    assert index.terms() == ["a", "b", "c", "d"]
    assert index.document_frequency("a") == 1
    assert index.document_frequency("b") == 2
    assert index.document_frequency("c") == 2
    assert index.document_frequency("d") == 1


def test_ignores_empty_tokens():
    # index.rs:607-617 — double space introduces empty tokens.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="a  b"))
    assert index.terms() == ["a", "b"]
    assert list(index.docs[1].field_length) == [2]
    assert index.fields[0].sum == 2


def test_delete_and_vacuum_empties_index():
    # index.rs:624-658 — delete the only doc; structures empty, avg NaN.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="a"))
    index.remove_document(1)
    index.vacuum()

    assert len(index.docs) == 0
    assert len(index.fields) == 1
    assert index.fields[0].sum == 0
    assert math.isnan(index.fields[0].avg)  # asserted by index.rs:643
    assert index.terms() == []
    assert index.num_segments == 0
    assert index.removed_keys == set()


def test_latent_delete_keeps_postings_until_vacuum():
    # Mirrors the latent-deletion model (index.rs:161-199): postings survive
    # remove_document (expansion still sees the term) but df drops to 0.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="abc"))
    index.remove_document(1)
    assert index.expand_term("a") == ["abc"]  # postings still present
    assert index.document_frequency("abc") == 0  # but dead
    index.vacuum()
    assert index.expand_term("a") == []


def test_count_nodes_equivalent_term_membership():
    # index.rs:739-776 count_nodes tests, re-targeted: distinct terms.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="abc"))
    index.add_document([field_accessor], tokenizer, 2, Doc(id=2, text="abe"))
    assert index.terms() == ["abc", "abe"]

    index2 = Index(1)
    index2.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="ab cd"))
    index2.add_document([field_accessor], tokenizer, 2, Doc(id=2, text="ab ef"))
    assert index2.terms() == ["ab", "cd", "ef"]

    index3 = Index(1)
    assert index3.terms() == []


def test_prefix_range_lookup():
    # Replaces find_inverted_index_node / child-by-char tests
    # (index.rs:660-733) with the sorted-table equivalents.
    index = Index(1)
    for i, text in enumerate(["abc", "abd", "ax", "b"]):
        index.add_document([field_accessor], tokenizer, i, Doc(id=i, text=text))
    assert index.expand_term("ab") == ["abc", "abd"]
    assert index.expand_term("a") == ["abc", "abd", "ax"]
    assert index.expand_term("abc") == ["abc"]
    assert index.expand_term("abcx") == []
    assert index.expand_term("c") == []


def test_readd_same_key_replaces_document():
    # Documented divergence from index.rs:744-755: re-adding a key replaces
    # the old document instead of leaving stale postings.
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="abc"))
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="abe"))
    assert len(index.docs) == 1
    assert index.document_frequency("abc") == 0
    assert index.document_frequency("abe") == 1


def test_field_stats_update_on_remove():
    # remove_document stat bookkeeping (index.rs:175-185).
    index = Index(1)
    index.add_document([field_accessor], tokenizer, 1, Doc(id=1, text="a b c"))
    index.add_document([field_accessor], tokenizer, 2, Doc(id=2, text="d e"))
    assert index.fields[0].sum == 5
    assert index.fields[0].avg == 2.5
    index.remove_document(1)
    assert index.fields[0].sum == 2
    assert index.fields[0].avg == 2.0


def test_multi_value_field_quirk():
    # index.rs:112-114: with multiple field values, sum accumulates but
    # field_length keeps only the LAST value's count.
    index = Index(1)

    def multi_accessor(doc):
        return ["a b c", "d e"]

    index.add_document([multi_accessor], tokenizer, 1, Doc(id=1, text=""))
    assert index.fields[0].sum == 5
    assert list(index.docs[1].field_length) == [2]


def test_segment_csr_invariants():
    # New-model white-box: CSR offsets are monotonic and postings doc-sorted.
    index = Index(1)
    for i in range(50):
        index.add_document([field_accessor], tokenizer, i, Doc(id=i, text=f"t{i % 7} shared"))
    index._flush_pending()
    for seg in index._segments:
        offs = seg.offsets
        assert offs[0] == 0 and offs[-1] == seg.num_postings
        assert np.all(np.diff(offs) >= 0)
        for tid in range(seg.num_terms):
            docs = seg.post_doc[offs[tid] : offs[tid + 1]]
            assert np.all(np.diff(docs) > 0)  # strictly increasing (dedup'd)
        assert np.array_equal(seg.post_occ, seg.post_tf.sum(axis=1))


def test_device_snapshot_cache_invalidation():
    # The cached device snapshot must be rebuilt when the index mutates OR
    # when snapshot-shaping config (chunk_size) changes — a stale snapshot
    # would silently serve the old chunk geometry.
    index = Index(1)
    for i in range(8):
        index.add_document([field_accessor], tokenizer, i, Doc(id=i, text=f"a{i} b"))
    d1 = index.device_index()
    assert index.device_index() is d1  # same version + config -> cached
    index.config.chunk_size = 512
    d2 = index.device_index()
    assert d2 is not d1 and d2.CHUNK == 512
    index.add_document([field_accessor], tokenizer, 99, Doc(id=99, text="b c"))
    d3 = index.device_index()
    assert d3 is not d2 and d3.version == index.version


class TestTermEscapeHelpers:
    """Unit behaviors of the NUL-safe fixed-width interning helpers
    (index/segment.py) — the foundation the r2 advisor fix rests on."""

    def test_probe_terms_clean_path_is_vectorized_lossless(self):
        from probly_search_tpu.index.segment import probe_terms_fixed

        terms = ["a", "abc", "café", "x" * 40]
        arr, blen = probe_terms_fixed(terms)
        assert list(arr) == terms
        assert blen.tolist() == [len(t.encode("utf-8")) for t in terms]

    def test_probe_terms_escaped_path_byte_lengths_are_raw(self):
        from probly_search_tpu.index.segment import (
            _unescape_one,
            probe_terms_fixed,
        )

        terms = ["a\x00", "a", "b\x01c", "a\x00\x00"]
        arr, blen = probe_terms_fixed(terms)
        # byte lengths always describe the RAW terms
        assert blen.tolist() == [len(t.encode("utf-8")) for t in terms]
        # escape is injective + reversible through the <U conversion
        back = [_unescape_one(str(t)) for t in arr]
        assert back == terms
        assert len(set(map(str, arr))) == len(terms)

    def test_prefix_range_survives_escaping(self):
        import numpy as np

        from probly_search_tpu.index.segment import escape_terms_fixed

        # Table with NUL-bearing terms; prefix probes must still carve the
        # right [lo, hi) window after escaping.
        raw = sorted(["a", "a\x00", "a\x00b", "ab", "b", "a\x01"])
        table = np.sort(escape_terms_fixed(raw))
        lo = np.searchsorted(table, escape_terms_fixed(["a"])[0])
        hi = np.searchsorted(table, "a" + "\U0010FFFF")
        got = sorted(str(t) for t in table[lo:hi])
        # every raw term starting with "a" is inside the window
        from probly_search_tpu.index.segment import _escape_one

        want = sorted(_escape_one(t) for t in raw if t.startswith("a"))
        assert got == want
