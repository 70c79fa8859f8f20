"""fever_ray — a Ray-Data-native distributed sketch / approximate-aggregation engine.

A from-scratch re-expression of the data-processing capabilities of DCSO/fever
(reference at /root/reference, studied for WHAT it computes, not HOW) as a
Ray Data library:

* ``fever_ray.sketches`` — pure numpy mergeable sketches (HyperLogLog,
  Count-Min, t-digest, KLL, DCSO-file-compatible Bloom filter).
* ``fever_ray.core`` — the mergeable-UDAF driver: per-batch partials via
  ``Dataset.map_batches`` → associative merge via ``groupby`` shuffles.
* ``fever_ray.ops`` — operator library (IoC/bloom matching with fever's
  match-priority semantics, CIDR containment, text analysis, dedup families,
  ANN search, aggregations).
* ``fever_ray.io_`` — sources/sinks, the deterministic Common-Crawl-style
  page-table generator, checkpoint manifest + lineage/metrics writers.
* ``fever_ray.pipelines`` — end-to-end pipelines (flagship sketch build).

Everything here derives from public knowledge only: the Ray Data / pyarrow
APIs, the reference repo's observable behavior, and published sketch papers.
"""

__version__ = "0.1.0"
