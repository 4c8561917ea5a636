"""Sources/sinks: synthetic corpus, driver-testdata adapters, catalog seam."""
