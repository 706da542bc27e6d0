"""Physical plan layer: the superstep kernel (per-partition CSR blocks,
salted scatter/gather shuffle-join, checkpoint + lineage + resume)."""
