"""CLI applications."""
