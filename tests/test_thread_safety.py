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
