"""Source readers (SURVEY §2.1 S3–S14) producing canonical DataFrames."""
