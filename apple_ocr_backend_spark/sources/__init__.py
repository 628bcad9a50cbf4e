"""Sources & sinks: corpus synthesizer, testdata loaders, snapshot-log tables."""
