"""Extension operators: dedup, similarity, text, multimodal."""
