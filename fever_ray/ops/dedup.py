"""Deduplication family over document/page tables — the core training-data
pipeline operators:

* exact_dedup        — content-hash partition + per-group min-id keeper
* minhash_lsh        — shingle → MinHash → LSH band buckets → verified
                       Jaccard pairs → connected components (min-label
                       propagation via groupby rounds)
* simhash_dedup      — 64-bit SimHash + banded buckets → Hamming-verified
* ngram_jaccard      — exact n-gram Jaccard verification kernel
* embedding_dups     — cosine-similarity near-dup pairs over an embedding
                       column (brute force per LSH bucket)

Scale notes (10^12 docs): every family shuffles only (key, small-payload)
rows — content hashes, signatures, band buckets — never raw text.  The
reference's only dedup is exact side-sets inside one process
(/root/reference/processing/dns_aggregator.go:145-168); these operators are
its web-scale generalization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..sketches.hashing import hash64
from ..sketches.minhash import (
    band_hashes,
    minhash_signature,
    shingle_hashes,
    simhash,
    hamming_distance,
)


# ------------------------------------------------------------------ exact
def add_content_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    text = batch.column(col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    h = hash64(text).astype(np.int64)
    return batch.append_column("content_hash", pa.array(h, type=pa.int64()))


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Keep the min-id row per distinct content. Returns (content keeper id,
    n_copies) plus the text hash.  Shuffle key = 64-bit content hash, so the
    shuffle moves (hash, id) pairs, not text."""
    hashed = ds.map_batches(
        lambda b: add_content_hash(b, text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.TableGroupBy(batch, ["content_hash"]).aggregate(
            [(id_col, "min"), (id_col, "count")]
        )
        return t.rename_columns(["content_hash", "keep_id", "n_copies"])

    from ray.data.aggregate import Min, Sum

    partials = hashed.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("content_hash").aggregate(
        Min("keep_id", alias_name="keep_id"), Sum("n_copies", alias_name="n_copies")
    )


# ------------------------------------------------------------------ minhash
class MinHashSignatures:
    """Actor stage: per-doc shingle → MinHash signature + LSH band rows.

    Emits exploded (band, band_hash, doc_id) rows ready for the bucket
    groupby.  num_perm/bands/rows and the shingle width are pinned
    parameters of the dedup job."""

    def __init__(self, n_shingle: int = 3, num_perm: int = 64, bands: int = 16, seed: int = 1):
        assert num_perm % bands == 0
        self.n = n_shingle
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        self.seed = seed

    def signature(self, text: str) -> np.ndarray:
        from ..sketches.minhash import batch_minhash_signatures

        return batch_minhash_signatures(
            [text], n=self.n, num_perm=self.num_perm, seed=self.seed
        )[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches.minhash import batch_minhash_signatures

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        sigs = batch_minhash_signatures(
            batch.column("text"), n=self.n, num_perm=self.num_perm, seed=self.seed
        )  # (n_docs, num_perm), fully vectorized
        # docs too short to shingle share the empty (all-max) signature —
        # dropping them prevents a quadratic all-pairs bucket of short docs
        has_sig = sigs[:, 0] != np.iinfo(np.uint64).max
        ids = ids[has_sig]
        sigs = sigs[has_sig]
        n_docs = len(ids)
        # band hashes for the whole batch: fold each band's rows (vectorized
        # across docs; loop only over rows-per-band, typically 4)
        groups = sigs[:, : self.bands * self.rows].reshape(n_docs, self.bands, self.rows)
        with np.errstate(over="ignore"):
            acc = np.zeros((n_docs, self.bands), dtype=np.uint64)
            from ..sketches.hashing import splitmix64

            for r in range(self.rows):
                acc = splitmix64(acc ^ groups[:, :, r] ^ np.uint64(r + 1))
        return pa.table(
            {
                "band": pa.array(
                    np.tile(np.arange(self.bands, dtype=np.int32), n_docs), type=pa.int32()
                ),
                "band_hash": pa.array(
                    acc.reshape(-1).astype(np.int64), type=pa.int64()
                ),
                "doc_id": pa.array(np.repeat(ids, self.bands), type=pa.int64()),
            }
        )


def minhash_candidate_pairs(ds, n_shingle=3, num_perm=64, bands=16, concurrency=None):
    """documents → candidate near-dup pairs (doc_a < doc_b) via LSH buckets.

    The signature stage is stateless (no loaded artifact), so it runs as
    plain tasks — no actor-pool spin-up."""
    signer = MinHashSignatures(n_shingle=n_shingle, num_perm=num_perm, bands=bands)

    def sign(batch: pa.Table) -> pa.Table:
        return signer(batch)

    band_rows = ds.map_batches(sign, batch_format="pyarrow", zero_copy_batch=True)

    # Pair generation: millions of tiny (band, band_hash) buckets would cost
    # one Python map_groups call EACH — instead hash-partition buckets into
    # ~n_parts coarse partitions (one Python call per partition), sort within
    # the partition, and emit pairs per bucket-run vectorized.
    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        bh = batch.column("band_hash").to_numpy(zero_copy_only=False)
        part = (bh.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def pairs_in_partition(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("band", "ascending"), ("band_hash", "ascending"), ("doc_id", "ascending")]
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bh = g.column("band_hash").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        n = len(ids)
        if n == 0:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
            )
        change = np.flatnonzero((np.diff(band) != 0) | (np.diff(bh) != 0)) + 1
        starts = np.concatenate(([0], change, [n]))
        a_out, b_out = [], []
        for s, e in zip(starts[:-1], starts[1:]):
            k = e - s
            if k > 1:
                iu, ju = np.triu_indices(k, k=1)
                a_out.append(ids[s:e][iu])
                b_out.append(ids[s:e][ju])
        if not a_out:
            return pa.table(
                {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64())}
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), type=pa.int64()),
            }
        )

    pairs = (
        band_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_in_partition, batch_format="pyarrow")
    )
    # dedup pairs produced by multiple bands
    from ray.data.aggregate import Count

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


def ngram_jaccard(text_a: str, text_b: str, n: int = 3) -> float:
    """Exact n-gram (word-shingle) Jaccard similarity — the verification
    kernel for candidate pairs."""
    sa = set(shingle_hashes(text_a, n=n).tolist())
    sb = set(shingle_hashes(text_b, n=n).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / max(len(sa | sb), 1)


def minhash_dedup_components(ds, threshold: float = 0.7, n_shingle=3, num_perm=64, bands=16):
    """Full near-dedup: candidates → exact-Jaccard verify → connected
    components → (doc_id, cluster_id = min doc id of its component).

    Verification joins text back per pair via a broadcast id→text map
    (small-corpus path; at 10^12 scale this becomes a bucketed join keyed on
    doc_id — see ops.relational.partitioned_hash_join).  Components use
    min-label propagation on the driver over the verified edge list, which
    is provably small (≤ pairs that shared an LSH band)."""
    import ray

    pairs = minhash_candidate_pairs(
        ds, n_shingle=n_shingle, num_perm=num_perm, bands=bands
    ).take_all()
    texts = {}
    for batch in ds.select_columns(["doc_id", "text"]).iter_batches(batch_format="pyarrow"):
        for did, text in zip(batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()):
            texts[did] = text

    edges = []
    for p in pairs:
        a, b = p["doc_a"], p["doc_b"]
        if ngram_jaccard(texts[a] or "", texts[b] or "", n=n_shingle) >= threshold:
            edges.append((a, b))

    # union-find over the (small) verified edge set
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    rows = [
        {"doc_id": d, "cluster_id": find(d)}
        for d in sorted({x for e in edges for x in e})
    ]
    return pa.Table.from_pylist(
        rows or [],
        schema=pa.schema([("doc_id", pa.int64()), ("cluster_id", pa.int64())]),
    )


# ------------------------------------------------------------------ simhash
class SimHashFingerprints:
    """Actor stage: 64-bit SimHash per doc + 4×16-bit band keys for
    bucketing (docs within Hamming distance ≤3 share ≥1 band — pigeonhole)."""

    def __init__(self, n_bands: int = 4):
        self.n_bands = n_bands
        self.band_bits = 64 // n_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..sketches.minhash import batch_simhash

        ids = batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        fps = batch_simhash(batch.column("text"))  # vectorized whole batch
        n_docs = len(ids)
        bands = np.arange(self.n_bands, dtype=np.uint64)
        mask = np.uint64((1 << self.band_bits) - 1)
        with np.errstate(over="ignore"):
            keys = (fps[:, None] >> (bands[None, :] * np.uint64(self.band_bits))) & mask
        fp_i64 = fps.view(np.int64)  # two's-complement reinterpretation
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, self.n_bands), type=pa.int64()),
                "band": pa.array(
                    np.tile(np.arange(self.n_bands, dtype=np.int32), n_docs),
                    type=pa.int32(),
                ),
                "band_key": pa.array(keys.reshape(-1).astype(np.int64), type=pa.int64()),
                "simhash": pa.array(np.repeat(fp_i64, self.n_bands), type=pa.int64()),
            }
        )


def simhash_near_dup_pairs(ds, max_hamming: int = 3, concurrency=None):
    """Banded SimHash blocking + exact Hamming verification per bucket."""
    fingerprinter = SimHashFingerprints()

    def fp(batch: pa.Table) -> pa.Table:
        return fingerprinter(batch)

    rows = ds.map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)

    # coarse partitions, one Python call each; verify per bucket-run inside
    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        bk = batch.column("band_key").to_numpy(zero_copy_only=False)
        part = (bk.astype(np.uint64) % np.uint64(n_parts)).astype(np.int32)
        return batch.append_column("part", pa.array(part, type=pa.int32()))

    def verify_partition(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        order = pc.sort_indices(
            group,
            sort_keys=[("band", "ascending"), ("band_key", "ascending"), ("doc_id", "ascending")],
        )
        g = group.take(order)
        band = g.column("band").to_numpy(zero_copy_only=False)
        bk = g.column("band_key").to_numpy(zero_copy_only=False)
        ids = g.column("doc_id").to_numpy(zero_copy_only=False)
        fps = g.column("simhash").to_numpy(zero_copy_only=False).astype(np.int64).view(np.uint64)
        n = len(ids)
        a_out, b_out, d_out = [], [], []
        if n:
            change = np.flatnonzero((np.diff(band) != 0) | (np.diff(bk) != 0)) + 1
            starts = np.concatenate(([0], change, [n]))
            for s, e in zip(starts[:-1], starts[1:]):
                k = e - s
                if k <= 1:
                    continue
                iu, ju = np.triu_indices(k, k=1)
                da = hamming_distance(fps[s:e][iu], fps[s:e][ju])
                keep = (da <= max_hamming) & (ids[s:e][iu] != ids[s:e][ju])
                if keep.any():
                    xa, xb = ids[s:e][iu][keep], ids[s:e][ju][keep]
                    a_out.append(np.minimum(xa, xb))
                    b_out.append(np.maximum(xa, xb))
                    d_out.append(da[keep])
        if not a_out:
            return pa.table(
                {
                    "doc_a": pa.array([], type=pa.int64()),
                    "doc_b": pa.array([], type=pa.int64()),
                    "hamming": pa.array([], type=pa.int64()),
                }
            )
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(a_out), type=pa.int64()),
                "doc_b": pa.array(np.concatenate(b_out), type=pa.int64()),
                "hamming": pa.array(np.concatenate(d_out).astype(np.int64), type=pa.int64()),
            }
        )

    pairs = (
        rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(verify_partition, batch_format="pyarrow")
    )
    from ray.data.aggregate import Min

    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Min("hamming", alias_name="hamming"))


# ------------------------------------------------------------------ embeddings
def embedding_dup_pairs(ds, threshold: float = 0.95, n_planes: int = 8, verify_all: bool = False):
    """Near-dup pairs by embedding cosine similarity.

    Scale path: random-hyperplane LSH bucket (n_planes-bit signature of the
    sign pattern) then exact cosine verification inside buckets; two vectors
    with cosine ≥ threshold collide with high probability.  ``verify_all``
    forces a single bucket (exact brute force) for small inputs/oracles."""
    import ray

    def to_mat(batch: pa.Table):
        emb = batch.column("embedding")
        mat = np.vstack([np.asarray(v, dtype=np.float64) for v in emb.to_pylist()])
        return mat

    def bucketize(batch: pa.Table) -> pa.Table:
        mat = to_mat(batch)
        if verify_all:
            sig = np.zeros(len(mat), dtype=np.int64)
        else:
            # seeded plane matrix regenerated per task: deterministic and
            # cheaper than broadcasting (dim × n_planes floats)
            pl = np.random.default_rng(7).standard_normal((mat.shape[1], n_planes))
            bits = (mat @ pl) > 0
            sig = np.zeros(len(mat), dtype=np.int64)
            for j in range(bits.shape[1]):
                sig |= bits[:, j].astype(np.int64) << j
        norms = np.linalg.norm(mat, axis=1)
        normed = mat / np.maximum(norms, 1e-12)[:, None]
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "bucket": pa.array(sig, type=pa.int64()),
                "vec": pa.array(list(normed), type=pa.list_(pa.float64())),
            }
        )

    rows = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        ids = group.column("vec_id").to_pylist()
        mat = np.vstack([np.asarray(v) for v in group.column("vec").to_pylist()])
        sims = mat @ mat.T
        a, b, s = [], [], []
        n = len(ids)
        iu, ju = np.triu_indices(n, k=1)
        keep = sims[iu, ju] >= threshold
        for i, j, sv in zip(iu[keep], ju[keep], sims[iu, ju][keep]):
            x, y = ids[int(i)], ids[int(j)]
            a.append(min(x, y))
            b.append(max(x, y))
            s.append(float(sv))
        return pa.table(
            {
                "vec_a": pa.array(a, type=pa.int64()),
                "vec_b": pa.array(b, type=pa.int64()),
                "cosine": pa.array(s, type=pa.float64()),
            }
        )

    from ray.data.aggregate import Max

    pairs = rows.groupby("bucket").map_groups(verify, batch_format="pyarrow")
    return pairs.groupby(["vec_a", "vec_b"]).aggregate(Max("cosine", alias_name="cosine"))
