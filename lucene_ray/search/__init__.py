from lucene_ray.search.similarity import BM25Similarity, BM25Scorer

__all__ = ["BM25Similarity", "BM25Scorer"]
