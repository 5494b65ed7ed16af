"""Query engines: DataFrame BM25, segment-backed block-max WAND, concordances."""
