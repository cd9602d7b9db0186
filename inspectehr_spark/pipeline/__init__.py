"""The web-scale quality-filter pipeline: corpus fixtures, text extraction,
model-scoring pandas UDFs, PII scrub, end-to-end runner with resume."""
