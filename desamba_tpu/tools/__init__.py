"""Data tooling: fqx (raw text -> FASTQ), random text generation."""
