"""Data sources: the custom rate-limited npm-registry DataSource (batch +
streaming) and reader helpers."""
