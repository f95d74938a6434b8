"""Interleaved add/remove/query from multiple threads (the SURVEY §5
race-detection plan; supersedes the reference's Mutex smoke test,
integrations_tests.rs:151-168)."""

import random
import threading

from probly_search_tpu import Index, bm25
from .util import Doc, title_extract, tokenizer


def test_concurrent_mutation_and_query():
    ix = Index(1)
    errors = []
    stop = threading.Event()

    def writer(tid):
        rng = random.Random(tid)
        try:
            for i in range(200):
                key = tid * 1000 + i
                ix.add_document(
                    [title_extract], tokenizer, key,
                    Doc(id=key, title=f"w{rng.randint(0, 30)} shared t{tid}"),
                )
                if i % 7 == 0:
                    ix.remove_document(key)
                if i % 50 == 49:
                    ix.vacuum()
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            while not stop.is_set():
                ix.query("shared w1", bm25.new(), tokenizer, [1.0])
                ix.document_frequency("shared")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    writers = [threading.Thread(target=writer, args=(t,)) for t in range(4)]
    readers = [threading.Thread(target=reader) for _ in range(2)]
    for t in readers + writers:
        t.start()
    for t in writers:
        t.join()
    stop.set()
    for t in readers:
        t.join()
    assert not errors, errors

    # Final state is consistent: every non-removed key queryable.
    r = ix.query("shared", bm25.new(), tokenizer, [1.0])
    assert len(r) == len(ix.docs)


def test_device_index_concurrent_plan_pool_growth():
    """Concurrent query_batch_async callers grow the term-plan pool under
    the plan lock; every thread must see consistent plans (parity with the
    host oracle) even when all terms are cache misses."""
    from probly_search_tpu import Index, bm25, whitespace_tokenizer

    ix = Index(1)
    rng = random.Random(3)
    vocab = ["t%04d" % i for i in range(400)]
    texts = [" ".join(rng.choice(vocab) for _ in range(8)) for _ in range(600)]
    ix.add_documents_columnar(list(range(600)), [texts])
    dix = ix.device_index()
    scorer = bm25.new()

    # Disjoint novel-term batches per thread -> every thread mutates pools.
    batches = [
        ["%s %s" % (vocab[i], vocab[i + 200]) for i in range(t * 40, t * 40 + 40)]
        for t in range(4)
    ]
    out = {}
    errs = []

    def worker(t):
        try:
            out[t] = dix.query_batch(batches[t], scorer, top_k=5)
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    for t, rows in out.items():
        for q, got in zip(batches[t], rows):
            want = ix.query(q, bm25.new(), whitespace_tokenizer, [1.0])[:5]
            assert [g.key for g in got] == [w.key for w in want], (q,)
            for g, w in zip(got, want):
                assert abs(g.score - w.score) <= 2e-5 * max(1.0, abs(w.score))
