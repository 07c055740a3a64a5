"""Host-side utilities: files, metrics, visualization."""
