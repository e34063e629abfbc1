"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing — the operations a 100 TB
pretraining-data pipeline runs over crawled documents."""
