"""Engine operators: CDC, flattening, top-k, dedup, similarity, text, multimodal."""
