"""Sources: page-table readers and synthetic-corpus loaders."""
