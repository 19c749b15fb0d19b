"""Large-scale training-data pipeline operations (beyond the reference):
deduplication, similarity search, text analysis, multimodal plumbing."""
