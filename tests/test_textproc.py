import numpy as np
import pandas as pd

from data_prepper_spark.corpus import gen_pages_local
from data_prepper_spark.textproc import (
    extract_text,
    extract_text_series,
    tokenize,
    tokenize_counts,
)


def test_extract_roundtrip_bytes():
    html = "<html><head><title>t</title></head><body><p>Hello World 42</p></body></html>".encode()
    assert extract_text(html) == "Hello World 42"


def test_extract_fallback():
    assert extract_text(b"<div>abc</div>") == "abc"


def test_tokenize_spec():
    assert tokenize("Hello, World! x2") == ["hello", "world", "x2"]
    assert tokenize("") == []


def test_corpus_extraction_byte_identity():
    pages = gen_pages_local(200)
    extracted = extract_text_series(pages["html"])
    assert (extracted == pages["text"]).all()


def test_tokenize_counts_matches_scalar():
    texts = pd.Series(["the cat the dog", "", "a a a b"])
    owners, terms, tfs, lens = tokenize_counts(texts)
    got = {}
    for o, t, c in zip(owners, terms, tfs):
        got[(int(o), t)] = int(c)
    assert got == {(0, "cat"): 1, (0, "dog"): 1, (0, "the"): 2, (2, "a"): 3, (2, "b"): 1}
    assert list(lens) == [4, 0, 4]


def test_corpus_determinism():
    a = gen_pages_local(50)
    b = gen_pages_local(50)
    assert a.equals(b)
    # sharded generation equals contiguous generation
    from data_prepper_spark.corpus import gen_pages

    shard = gen_pages(np.array([10, 20, 30]))
    full = gen_pages_local(31)
    for i, idx in enumerate([10, 20, 30]):
        assert shard["url"][i] == full["url"][idx]
        assert shard["html"][i] == full["html"][idx]
