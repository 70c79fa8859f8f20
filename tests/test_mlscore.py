"""Linear classifier scoring stage: determinism, custom-weight broadcast,
empty-text convention, partition invariance."""

import numpy as np
import pyarrow as pa
import pytest

from fever_ray.ops.mlscore import (
    DEFAULT_DIM,
    LinearScorer,
    linear_score,
    make_standin_weights,
)


def _score_map(ds, **kw):
    return {r["doc_id"]: (r["score"], r["kept"]) for r in linear_score(ds, **kw).take_all()}


def test_standin_weights_deterministic_and_bounded():
    w = make_standin_weights()
    assert w.dtype == np.int64 and len(w) == DEFAULT_DIM
    assert w.min() >= -500 and w.max() <= 500
    assert np.array_equal(w, make_standin_weights())
    # not degenerate: both signs present
    assert (w > 0).any() and (w < 0).any()


def test_empty_and_null_text_score_zero(ray_session):
    import ray.data as rd

    out = _score_map(
        rd.from_items(
            [
                {"doc_id": 1, "text": ""},
                {"doc_id": 2, "text": None},
                {"doc_id": 3, "text": "alpha bravo charlie"},
            ]
        )
    )
    assert out[1] == (0, True)
    assert out[2] == (0, True)
    assert out[3][0] != 0  # vanishing odds of an exact-zero 3-token sum


def test_score_is_partition_invariant(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    words = "alpha bravo charlie delta echo foxtrot golf hotel".split()
    rows = [
        {"doc_id": i, "text": " ".join(rng.choice(words, size=rng.integers(1, 40)))}
        for i in range(300)
    ]
    a = _score_map(rd.from_items(rows).repartition(1))
    b = _score_map(rd.from_items(rows).repartition(17))
    assert a == b


def test_custom_weights_broadcast_and_duplicate_tokens_count(ray_session):
    import ray.data as rd

    # weight every bucket 1 → score == token count (multiplicity matters)
    w = np.ones(DEFAULT_DIM, dtype=np.int64)
    out = _score_map(
        rd.from_items(
            [
                {"doc_id": 1, "text": "x x x"},
                {"doc_id": 2, "text": "x y"},
            ]
        ),
        weights=w,
    )
    assert out[1] == (3, True)
    assert out[2] == (2, True)


def test_non_int64_weights_rejected(ray_session):
    with pytest.raises(Exception):
        LinearScorer(weights=np.ones(DEFAULT_DIM, dtype=np.float64))


def test_negative_scores_not_kept(ray_session):
    import ray.data as rd

    w = np.full(DEFAULT_DIM, -1, dtype=np.int64)
    out = _score_map(rd.from_items([{"doc_id": 1, "text": "a b c"}]), weights=w)
    assert out[1] == (-3, False)
