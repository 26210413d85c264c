"""Sources/sinks: pages-table helpers, driver-testdata loaders."""
