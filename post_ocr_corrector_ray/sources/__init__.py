"""Sources: synthetic page generation, parquet IO, markup corpus parsing."""
