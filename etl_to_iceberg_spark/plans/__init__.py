"""Plan inspection utilities."""
