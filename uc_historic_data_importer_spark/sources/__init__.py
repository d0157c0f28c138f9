"""Sources (SURVEY.md §2.1): object listing + pairing, encryption-metadata
resolution, and the encrypted-gzipped-JSONL stream source."""
