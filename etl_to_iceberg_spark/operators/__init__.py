"""Relational, CDC, and managed-table operators (the engine's query surface)."""
