from lucene_ray.analysis.tokenizer import CodeTokenizer, StandardLikeAnalyzer

__all__ = ["CodeTokenizer", "StandardLikeAnalyzer"]
