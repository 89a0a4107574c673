"""Named query plans (the engine's headline queries)."""
