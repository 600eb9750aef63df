import pyarrow as pa

from ertransfer_ray.functions.textnorm import extract_text_from_html
from ertransfer_ray.sources.pages import generate_pages


def test_schema_matches_input_hint(pages_corpus):
    pages = pages_corpus["pages"]
    schema = pages.schema
    assert schema.field("url").type == pa.string()
    assert schema.field("warc_ts").type == pa.timestamp("us")
    assert schema.field("html").type == pa.binary()
    assert schema.field("text").type == pa.string()
    assert schema.field("lang").type == pa.string()


def test_byte_identical_extraction(pages_corpus):
    pages = pages_corpus["pages"]
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    for h, t in zip(htmls, texts):
        assert extract_text_from_html(h) == t


def test_deterministic_regeneration(pages_corpus):
    again = generate_pages(num_entities=120, max_dups=4, seed=42)
    assert again["pages"].equals(pages_corpus["pages"])
    assert again["truth_pairs"].equals(pages_corpus["truth_pairs"])


def test_urls_unique_and_truth_consistent(pages_corpus):
    pages = pages_corpus["pages"]
    urls = pages.column("url").to_pylist()
    assert len(urls) == len(set(urls))
    tc = pages_corpus["truth_clusters"]
    assert set(tc.column("url").to_pylist()) == set(urls)
    tp = pages_corpus["truth_pairs"]
    assert tp.num_rows > 100
    labels = set(tp.column("label").to_pylist())
    assert labels == {0, 1}
    # pairs canonical: left < right, no duplicates
    lr = list(zip(tp.column("left_url").to_pylist(), tp.column("right_url").to_pylist()))
    assert all(a < b for a, b in lr)
    assert len(lr) == len(set(lr))
