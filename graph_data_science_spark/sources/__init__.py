"""Sources: corpus synthesis + import-edge extraction (the input_hint path)."""
