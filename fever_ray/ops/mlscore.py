"""Linear model scoring over hashed bag-of-words features — the
"quality classifier" stage of a training-data pipeline (fasttext-style
linear text classifier, CCNet/Gopher-style quality gate) expressed as a
Ray Data actor-pool stage.

The production shape this models: a trained weight vector is broadcast
once (``ray.put``), each actor materializes its lookup table in
``__init__`` (once per actor, never per batch), and scoring is one
vectorized pass per batch — token hash → feature bucket → weight gather →
per-doc segment sum.  Integer weights keep the score exactly reproducible
across partitionings AND SQL-mirrorable (float dot products would drift in
the last ulp between engines; see the integer-cents rule in BASELINE.md).

In-sandbox there is no trained artifact, so the default model is a
DETERMINISTIC stand-in: weight(bucket) = splitmix64(bucket XOR seed) mod
1001 - 500 ∈ [-500, 500].  The plumbing — broadcast, per-actor LUT,
vectorized featurization, segment sums — is the real, tested component;
swap ``weights`` for a trained vector to deploy (same contract as the
multimodal decode stubs, fever's enrichment-handler pattern:
/root/reference/processing/unicorn_aggregator.go:41-66 pre-filter + score).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64, splitmix64
from .textstats import _flat_tokens

# golden-ratio odd constant: the default stand-in weight family seed
DEFAULT_WEIGHT_SEED = 0x9E3779B97F4A7C15
DEFAULT_DIM = 1 << 16


def make_standin_weights(dim: int = DEFAULT_DIM, seed: int = DEFAULT_WEIGHT_SEED) -> np.ndarray:
    """Deterministic integer weight vector: splitmix64(bucket ^ seed) mod
    1001 - 500.  Mirrored verbatim by the ``linear_score`` oracle SQL."""
    b = np.arange(dim, dtype=np.uint64)
    with np.errstate(over="ignore"):
        w = splitmix64(b ^ np.uint64(seed & 0xFFFFFFFFFFFFFFFF))
    return (w % np.uint64(1001)).astype(np.int64) - 500


def _validate_weights(lut: np.ndarray, dim: int) -> None:
    if lut.dtype != np.int64:
        raise TypeError("LinearScorer weights must be int64 (exactness contract)")
    if len(lut) != dim:
        raise ValueError(f"weights length {len(lut)} != dim {dim}")
    # bound magnitudes so the batch-wide prefix sum can never wrap int64
    # (2^31 × a trillion tokens per batch still fits)
    if len(lut) and int(np.abs(lut).max()) > (1 << 31):
        raise ValueError("LinearScorer weights must satisfy |w| <= 2^31")


class LinearScorer:
    """Actor stage: per-doc integer linear score over hashed token features.

    ``weights``: an ``ObjectRef`` to (or plain ndarray of) int64 weights of
    length ``dim`` — a trained model in production, the deterministic
    stand-in by default.  Resolved ONCE in ``__init__`` (per actor), so the
    model ships to each worker exactly once regardless of batch count.
    """

    def __init__(
        self,
        weights=None,
        dim: int = DEFAULT_DIM,
        seed: int = DEFAULT_WEIGHT_SEED,
        id_col: str = "doc_id",
        text_col: str = "text",
    ):
        import ray

        if weights is None:
            lut = make_standin_weights(dim, seed)
        elif isinstance(weights, ray.ObjectRef):
            lut = ray.get(weights)
        else:
            lut = np.asarray(weights)
        _validate_weights(lut, dim)
        self.lut = lut
        self.dim = np.uint64(dim)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        # empty/null text = zero tokens = score 0 (the token_stats
        # convention; _flat_tokens would otherwise emit one '' token)
        nonempty = pc.fill_null(
            pc.not_equal(pc.cast(text, pa.string()), ""), False
        ).to_numpy(zero_copy_only=False)
        flat, offs = _flat_tokens(batch, self.text_col)
        buckets = (hash64(flat) % self.dim).astype(np.int64)
        wt = self.lut[buckets]
        # exact segment sums via prefix-sum differences (the char_bigram_oov
        # pattern) — scatter-add (np.add.at) is element-at-a-time and 10-100x
        # slower on this hot path; |w| <= 500 keeps the int64 cumsum far from
        # overflow at any batch size
        cs = np.concatenate(([0], np.cumsum(wt)))
        score = cs[offs[1:]] - cs[offs[:-1]]
        score[~nonempty] = 0
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "score": pa.array(score, pa.int64()),
                "kept": pa.array(score >= 0),
            }
        )


def linear_score(
    ds,
    weights: np.ndarray | None = None,
    dim: int = DEFAULT_DIM,
    seed: int = DEFAULT_WEIGHT_SEED,
    id_col: str = "doc_id",
    text_col: str = "text",
    concurrency=(1, 8),
    batch_size: int = 4096,
):
    """documents → (id, integer score, kept) via a broadcast linear model.

    Scale shape: no shuffle at all — the model broadcasts once, every batch
    scores locally; output is a skinny (id, score, kept) stream."""
    import ray

    if weights is not None:
        w = np.asarray(weights)
        _validate_weights(w, dim)  # fail fast HERE, not inside each actor
        ref = ray.put(w)
    else:
        ref = None
    return ds.map_batches(
        LinearScorer,
        fn_constructor_kwargs=dict(
            weights=ref, dim=dim, seed=seed, id_col=id_col, text_col=text_col
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
        batch_size=batch_size,
    )
