"""lucene_ray — a Ray-Data-native full-text index + BM25 search engine.

A from-scratch rebuild of the *capabilities* of Apache Lucene's core
index+search path (reference: /root/reference, Apache Lucene main), expressed
idiomatically on Ray Data:

- ingest: ``ray.data`` pipeline over Parquet source tables, zero-copy Arrow
  batches, deterministic doc-ID assignment ``(partition_id << 32) | offset``;
- inversion: ``map_batches`` tokenize + per-partition partial posting lists
  (the analog of Lucene's per-thread DWPT buffers,
  lucene/core/src/java/org/apache/lucene/index/DocumentsWriterPerThread.java);
- merge: ``groupby("term")`` shuffle with delta + FOR/vbyte compression and
  per-block impacts (analog of Lucene103PostingsWriter block encoding);
- query: BM25 (float32-exact vs BM25Similarity.java) top-k with per-partition
  scoring and a driver merge using Lucene's TopDocs.merge tie-break.
"""

__version__ = "0.1.0"
