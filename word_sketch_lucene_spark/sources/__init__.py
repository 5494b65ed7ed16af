"""Sources & sinks: synthetic page generator, text extraction, CoNLL-U scan, exports."""
