"""Prebuilt rule catalogs + run planning (manifest-driven resume)."""
