"""Mergeable sketch kernels (pure numpy, no Ray dependency).

Every sketch satisfies the mergeable-UDAF contract used by
``fever_ray.core.udaf``:

* ``update(batch_values)`` — vectorized batch ingestion
* ``merge(other)``         — associative (bit-identical for HLL/CMS/Bloom;
                             within published error bound for quantiles)
* ``to_bytes()/from_bytes`` — stable little-endian serialization so partials
                             travel through the object store as tiny blobs

This generalizes the reference's per-handler in-memory aggregation state
(/root/reference/processing/handler.go:13-34 and the aggregators in
processing/) into state that shuffles and merges instead of living behind a
mutex in one process.
"""

from .bloom import BloomFilter, BloomKTooHighError, build_filter
from .cbf import CountingBloom
from .cms import CountMin
from .dcms import DyadicCountMin
from .ams import AMSSketch
from .dd import DDSketch
from .fd import FrequentDirections
from .hll import HyperLogLog
from .kll import KLL
from .lc import LinearCounter
from .mg import MisraGries
from .req import REQ
from .tdigest import TDigest
from .theta import ThetaSketch
from . import hashing, minhash

SKETCH_TYPES = {
    "hll": HyperLogLog,
    "cms": CountMin,
    "tdigest": TDigest,
    "kll": KLL,
    "bloom": BloomFilter,
    "theta": ThetaSketch,
    "fd": FrequentDirections,
    "ams": AMSSketch,
    "mg": MisraGries,
    "req": REQ,
    "dd": DDSketch,
    "dcms": DyadicCountMin,
    "cbf": CountingBloom,
    "lc": LinearCounter,
}


def sketch_from_bytes(kind: str, blob: bytes):
    """Deserialize a sketch partial by registry kind."""
    return SKETCH_TYPES[kind].from_bytes(blob)


__all__ = [
    "BloomFilter",
    "BloomKTooHighError",
    "build_filter",
    "AMSSketch",
    "CountingBloom",
    "CountMin",
    "DDSketch",
    "DyadicCountMin",
    "FrequentDirections",
    "HyperLogLog",
    "KLL",
    "LinearCounter",
    "MisraGries",
    "REQ",
    "TDigest",
    "ThetaSketch",
    "SKETCH_TYPES",
    "sketch_from_bytes",
    "hashing",
    "minhash",
]
