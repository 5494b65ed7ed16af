"""Engine operators: proximity/dependency joins, collocation sketches,
semantic-field exploration, dedup, similarity search, text QC."""
