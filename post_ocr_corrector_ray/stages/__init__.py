"""Ray Data map_batches stage callables (stateless tasks + actor pools)."""
