"""Tool package marker (lets tools import each other)."""
