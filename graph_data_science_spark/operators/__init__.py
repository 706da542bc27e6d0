"""Algorithm catalog (the GDS procedure surface, Spark-first)."""
