"""Named operators — the engine's public query surface."""
