"""Cursor pagination (``search_after``): only documents strictly after a
``(score, doc_id)`` cursor in (round6(score) desc, doc_id asc) order are
returned — the Elasticsearch ``search_after`` contract, the scale-correct
deep-paging mode (page N costs page-1 work, unlike ``offset``).

Invariants: cursor pages tile the deep top-k exactly; every serving path
agrees (wand kernel, relational plan, point tier); a cursor past the last
match yields an empty page; ``after`` and ``offset`` are mutually
exclusive.
"""

from __future__ import annotations

import pytest

from fts_engine_spark.query import FtsIndex

QUERY = "turtle hotel data"


def _rows(df):
    return [(int(r["doc_id"]), round(float(r["score"]), 9)) for r in df.collect()]


def _cur(row):
    """(doc_id, score) result row -> (score, doc_id) cursor."""
    return (row[1], row[0])


@pytest.fixture(scope="module")
def fts(spark, small_index):
    index_dir, _ = small_index
    return FtsIndex(spark, index_dir)


def test_cursor_pages_tile_the_deep_topk(fts):
    deep = _rows(fts.search_bm25(QUERY, k=30))
    assert len(deep) == 30
    pages, cursor = [], None
    for _ in range(3):
        page = _rows(fts.search_bm25(QUERY, k=10, after=cursor))
        assert len(page) == 10
        pages.extend(page)
        cursor = _cur(page[-1])
    assert pages == deep


def test_cursor_equals_offset_pages(fts):
    page1 = _rows(fts.search_bm25(QUERY, k=10))
    by_offset = _rows(fts.search_bm25(QUERY, k=10, offset=10))
    by_cursor = _rows(fts.search_bm25(QUERY, k=10, after=_cur(page1[-1])))
    assert by_cursor == by_offset


def test_cursor_modes_agree(fts):
    page1 = _rows(fts.search_bm25(QUERY, k=7))
    cur = _cur(page1[-1])
    wand = _rows(fts.search_bm25(QUERY, k=7, after=cur, mode="wand"))
    rel = _rows(fts.search_bm25(QUERY, k=7, after=cur, mode="relational"))
    assert wand == rel and len(wand) == 7


def test_cursor_point_tier_matches_distributed(fts):
    fts.warm().enable_point_serving()
    try:
        page1 = _rows(fts.search_bm25(QUERY, k=10))
        cur = _cur(page1[-1])
        dist = _rows(fts.search_bm25(QUERY, k=10, after=cur))
        point = [
            (d, round(s, 9))
            for d, s in fts.search_bm25_point(QUERY, k=10, after=cur)
        ]
        assert point == dist
        # point-tier cursor chain tiles the point-tier deep top-k too
        deep = [
            (d, round(s, 9)) for d, s in fts.search_bm25_point(QUERY, k=20)
        ]
        p1 = [(d, round(s, 9)) for d, s in fts.search_bm25_point(QUERY, k=10)]
        p2 = [
            (d, round(s, 9))
            for d, s in fts.search_bm25_point(QUERY, k=10, after=_cur(p1[-1]))
        ]
        assert p1 + p2 == deep
    finally:
        fts.close()


def test_cursor_past_end_is_empty(fts):
    allr = _rows(fts.search_bm25(QUERY, k=0))
    last = allr[-1]
    assert _rows(fts.search_bm25(QUERY, k=10, after=_cur(last))) == []


def test_cursor_composes_with_filters(fts):
    # conjunctive + cursor: the cursor slices the conjunctive order
    deep = _rows(fts.search_bm25(QUERY, k=10, conjunctive=True))
    if len(deep) > 3:
        head, tail = deep[:3], deep[3:]
        page = _rows(
            fts.search_bm25(
                QUERY, k=len(tail), conjunctive=True, after=_cur(head[-1])
            )
        )
        assert page == tail


def test_cursor_offset_mutually_exclusive(fts):
    with pytest.raises(ValueError, match="offset or after"):
        fts.search_bm25(QUERY, k=5, offset=5, after=(1.0, 3))
